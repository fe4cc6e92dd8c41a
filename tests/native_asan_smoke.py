"""AddressSanitizer smoke run of the native stitch library.

Invoked by ``make test-native-asan`` with LD_PRELOAD=libasan and
HELEN_TPU_ASAN_SO pointing at the ASAN build. Exercises the aligner across
many shapes (empty, tiny, unequal, long, N-heavy) and the RLE expansion with
tight buffers; any heap error aborts the process with an ASAN report.
"""
import ctypes
import os
import sys


def main() -> int:
    so = os.environ.get("HELEN_TPU_ASAN_SO")
    if not so or not os.path.exists(so):
        print("HELEN_TPU_ASAN_SO not set/built; run via 'make test-native-asan'")
        return 2
    lib = ctypes.CDLL(so)

    class Alignment(ctypes.Structure):
        _fields_ = [(n, ctypes.c_int32) for n in (
            "score", "score2", "ref_begin", "ref_end",
            "query_begin", "query_end", "ref_end2", "cigar_len")]

    import random

    random.seed(0)
    cases = [
        ("A", "A"), ("ACGT" * 50, "ACGT" * 50), ("AAAA", "TTTT"),
        ("N" * 30, "N" * 30), ("ACGT", "A" * 200), ("", "ACGT"), ("ACGT", ""),
    ]
    for _ in range(200):
        n1, n2 = random.randint(1, 300), random.randint(1, 300)
        cases.append((
            "".join(random.choice("ACGTN") for _ in range(n1)),
            "".join(random.choice("ACGTN") for _ in range(n2)),
        ))
    out = Alignment()
    for ref, query in cases:
        cap = 2 * (len(ref) + len(query)) + 8
        buf = (ctypes.c_uint32 * max(cap, 1))()
        lib.helen_ssw_align(
            ref.encode(), len(ref), query.encode(), len(query),
            4, 6, 8, 2, 0, 1, ctypes.byref(out), buf, cap,
        )
    # RLE expansion with an exactly-sized buffer
    bases = bytes([1, 2, 3, 4, 0, 1] * 100)
    rles = bytes([10, 1, 5, 2, 9, 0] * 100)
    need = sum(r for b, r in zip(bases, rles) if 1 <= b <= 4 and r > 0)
    outbuf = ctypes.create_string_buffer(need)
    n = lib.helen_rle_expand(bases, rles, len(bases), outbuf, need)
    assert n == need, (n, need)
    # and a deliberately undersized buffer must return -1, not overflow
    small = ctypes.create_string_buffer(4)
    assert lib.helen_rle_expand(bases, rles, len(bases), small, 4) == -1
    # banded edit distance: exercise band edges, the swap branch, empty
    # inputs, and the -1 (distance exceeds band) path under ASAN
    lib.helen_banded_edit_distance.restype = ctypes.c_int64
    lib.helen_banded_edit_distance.argtypes = [
        ctypes.c_char_p, ctypes.c_int64, ctypes.c_char_p, ctypes.c_int64,
        ctypes.c_int64,
    ]
    ed_cases = [(a, b, band) for (a, b) in cases[:50] for band in (1, 4, 512)]
    ed_cases += [("", "", 8), ("", "ACGT", 8), ("ACGT" * 100, "ACGT" * 90, 2)]
    for a, b, band in ed_cases:
        d = lib.helen_banded_edit_distance(
            a.encode(), len(a), b.encode(), len(b), band)
        assert d >= -1 and d <= max(len(a), len(b))
    assert lib.helen_banded_edit_distance(b"AAAA", 4, b"TTTT", 4, 512) == 4
    print(f"asan smoke: {len(cases)} alignments + rle expansion + "
          f"{len(ed_cases)} edit distances clean")
    return 0


if __name__ == "__main__":
    sys.exit(main())
