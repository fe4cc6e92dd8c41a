"""Head-to-head validation of the from-scratch aligner against the REFERENCE
SSW binary (compiled as a test oracle from the read-only reference checkout).

Skipped when /root/reference is not present. Checks, over hundreds of
stitch-realistic pairs, that score / begin positions / cigar — and therefore
the anchor decisions that determine output FASTA bytes — are identical.
"""
import ctypes
import os
import subprocess

import numpy as np
import pytest

from helen_tpu.config import STITCH
from helen_tpu.io.synthetic import random_sequence
from helen_tpu.stitch import Aligner, Alignment, Filter
from helen_tpu.stitch.engine import anchor_positions

REF = "/root/reference/helen/modules"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


class OracleResult(ctypes.Structure):
    _fields_ = [(n, ctypes.c_int32) for n in (
        "score", "ref_begin", "ref_end", "query_begin", "query_end",
        "cigar_len", "score2", "ref_end2", "mismatches")]


@pytest.fixture(scope="module")
def oracle(tmp_path_factory):
    build = tmp_path_factory.mktemp("ssw_oracle")
    so = str(build / "oracle.so")
    shim = os.path.join(os.path.dirname(__file__), "ssw_oracle_shim.cpp")
    # compile the reference C core and C++ wrapper unmodified, plus the shim
    subprocess.run(
        [
            "g++", "-O2", "-shared", "-fPIC", "-msse2",
            "-I", os.path.join(REF, "headers"),
            os.path.join(REF, "src/local_reassembly/ssw_cpp.cpp"),
            "-x", "c", os.path.join(REF, "src/local_reassembly/ssw.c"),
            "-x", "c++", shim,
            "-o", so,
        ],
        check=True, capture_output=True, text=True,
    )
    lib = ctypes.CDLL(so)
    lib.oracle_align.restype = ctypes.c_int
    lib.oracle_align.argtypes = [
        ctypes.c_char_p, ctypes.c_int32, ctypes.c_char_p, ctypes.c_int32,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_int32, ctypes.c_int32,
        ctypes.c_int32, ctypes.POINTER(OracleResult), ctypes.c_char_p,
        ctypes.c_int32,
    ]

    def align(ref, query, mask_len=0):
        out = OracleResult()
        buf = ctypes.create_string_buffer(8192)
        rc = lib.oracle_align(
            ref.encode(), len(ref), query.encode(), len(query),
            STITCH.match_score, STITCH.mismatch_penalty,
            STITCH.gap_open_penalty, STITCH.gap_extend_penalty,
            mask_len, ctypes.byref(out), buf, 8192,
        )
        assert rc == 0, rc
        return out, buf.value.decode()

    return align


def _ours(ref, query, mask_len=0):
    a = Aligner(STITCH.match_score, STITCH.mismatch_penalty,
                STITCH.gap_open_penalty, STITCH.gap_extend_penalty)
    a.SetReferenceSequence(ref, len(ref))
    al = Alignment()
    assert a.Align_cpp(query, Filter(), al, mask_len)
    return al


def _pairs():
    """Stitch-realistic pairs: near-identical overlaps with SNVs/indels/Ns,
    plus adversarial random pairs."""
    rng = np.random.default_rng(7)
    pairs = []
    for seed in range(150):
        n = int(rng.integers(40, 320))
        ref = random_sequence(n, seed=seed)
        q = list(ref)
        for _ in range(int(rng.integers(0, 6))):
            op = rng.integers(0, 3)
            j = int(rng.integers(0, max(1, len(q) - 1)))
            if op == 0:
                q[j] = "ACGT"[int(rng.integers(0, 4))]
            elif op == 1 and len(q) > 20:
                del q[j]
            else:
                q.insert(j, "ACGT"[int(rng.integers(0, 4))])
        if rng.random() < 0.2:  # N runs, as produced by the N-fill fallbacks
            j = int(rng.integers(0, max(1, len(q) - 10)))
            q[j : j + 10] = list("N" * 10)
        pairs.append((ref, "".join(q)))
    for seed in range(50):  # unrelated random pairs
        pairs.append((random_sequence(int(rng.integers(20, 150)), seed=1000 + seed),
                      random_sequence(int(rng.integers(20, 150)), seed=2000 + seed)))
    return pairs


def test_aligner_matches_reference_binary(oracle):
    mismatches = []
    for ref, query in _pairs():
        want, want_cigar = oracle(ref, query)
        got = _ours(ref, query)
        same = (
            got.best_score == want.score
            and got.reference_begin == want.ref_begin
            and got.reference_end == want.ref_end
            and got.query_begin == want.query_begin
            and got.query_end == want.query_end
            and got.cigar_string == want_cigar
        )
        if not same:
            mismatches.append((ref, query, (want.score, want.ref_begin, want_cigar),
                               (got.best_score, got.reference_begin, got.cigar_string)))
    assert not mismatches, f"{len(mismatches)} mismatches; first: {mismatches[0]}"


def test_mismatch_and_second_best_match_reference_binary(oracle):
    """Field-level parity beyond the stitch path: mismatches (X + indel
    lengths) and, with maskLen >= 15, the second-best score/position —
    including the word-kernel edge-column semantics the reference switches
    to when the byte score saturates at 255 (>=64 matched bases)."""
    rng = np.random.default_rng(11)
    pairs = []
    for seed in range(40):  # short: byte kernel (score < 255)
        ref = random_sequence(int(rng.integers(30, 60)), seed=300 + seed)
        pairs.append((ref, ref[2:-2]))
    for seed in range(40):  # long near-identical: word kernel (score >= 255)
        ref = random_sequence(int(rng.integers(120, 300)), seed=400 + seed)
        q = list(ref)
        for _ in range(int(rng.integers(0, 5))):
            q[int(rng.integers(0, len(q)))] = "ACGT"[int(rng.integers(0, 4))]
        pairs.append((ref, "".join(q)))
    for ref, query in pairs:
        for mask_len in (0, 15, 40):
            want, _ = oracle(ref, query, mask_len)
            got = _ours(ref, query, mask_len)
            assert got.best_score == want.score, (ref, query, mask_len)
            assert got.mismatches == want.mismatches, (ref, query, mask_len)
            assert got.best_score2 == want.score2, (ref, query, mask_len)
            assert got.ref_end_next_best == want.ref_end2, (ref, query, mask_len)


def test_anchor_decisions_match_reference_binary(oracle):
    """The stitch-visible decision: anchor (pos_a, pos_b) from cigar+begin."""
    for ref, query in _pairs()[:100]:
        want, want_cigar = oracle(ref, query)
        got = _ours(ref, query)
        if want.score == 0:
            assert got.best_score == 0
            continue
        ours = anchor_positions(got.cigar_string, got.reference_begin,
                                STITCH.overlap_threshold)
        theirs = anchor_positions(want_cigar, want.ref_begin,
                                  STITCH.overlap_threshold)
        assert ours == theirs, (ref, query, got.cigar_string, want_cigar)
