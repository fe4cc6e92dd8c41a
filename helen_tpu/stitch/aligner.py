"""Python aligner API over the native SSW library.

Mirrors the shape of the reference's pybind11 HELEN module
(helen/modules/headers/pybind_api.h:16-47): ``Aligner`` / ``Filter`` /
``Alignment`` with the same field names, so stitch-level code (and any user
code written against the reference bindings) ports directly.

The cigar string follows the reference C++ wrapper's convention
(ssw_cpp.cpp ConvertAlignment): leading/trailing soft clips for unaligned
query ends; the aligned core uses '='/'X' (match/mismatch) plus I/D.
"""
from __future__ import annotations

import ctypes
import dataclasses
from typing import List, Optional, Tuple

from helen_tpu.stitch._native import HelenAlignmentStruct, get_lib

_OP_CHARS = {0: "M", 1: "I", 2: "D", 4: "S"}


@dataclasses.dataclass
class Alignment:
    """Alignment result (field names match the reference bindings)."""

    best_score: int = 0
    best_score2: int = 0
    reference_begin: int = -1
    reference_end: int = -1
    query_begin: int = -1
    query_end: int = -1
    ref_end_next_best: int = -1
    mismatches: int = 0
    cigar_string: str = ""
    cigar: List[int] = dataclasses.field(default_factory=list)

    def Clear(self) -> None:
        self.__init__()


@dataclasses.dataclass
class Filter:
    report_begin_position: bool = True
    report_cigar: bool = True
    score_filter: int = 0
    distance_filter: int = 32767


class Aligner:
    """Striped-Smith-Waterman-compatible local aligner.

    Scoring: +match for base match, -mismatch otherwise (N scores -mismatch
    too, as in the reference default matrix); a length-L gap costs
    gap_open + (L-1)*gap_extend.
    """

    def __init__(
        self,
        match_score: int = 2,
        mismatch_penalty: int = 2,
        gap_opening_penalty: int = 3,
        gap_extending_penalty: int = 1,
    ):
        self.match = int(match_score)
        self.mismatch = int(mismatch_penalty)
        self.gap_open = int(gap_opening_penalty)
        self.gap_extend = int(gap_extending_penalty)
        self._ref: bytes = b""

    def SetReferenceSequence(self, seq: str, length: Optional[int] = None) -> int:
        if length is not None:
            seq = seq[:length]
        self._ref = seq.encode() if isinstance(seq, str) else bytes(seq)
        return len(self._ref)

    def Align_cpp(self, query: str, filter: Filter, alignment: Alignment, maskLen: int = 0) -> bool:
        """Align query against the stored reference; fills ``alignment``."""
        return self.align(query, alignment, filter=filter, mask_len=maskLen)

    def align(
        self,
        query: str,
        alignment: Optional[Alignment] = None,
        filter: Optional[Filter] = None,
        mask_len: int = 0,
    ) -> bool:
        if alignment is None:
            alignment = Alignment()
        filter = filter or Filter()
        # a reused Alignment must never carry the PREVIOUS pair's results
        # past a failed call (the reference C++ wrapper refills every call)
        alignment.Clear()
        q = query.encode() if isinstance(query, str) else bytes(query)
        if not self._ref or not q:
            return False
        lib = get_lib()
        out = HelenAlignmentStruct()
        cap = 2 * (len(q) + len(self._ref)) + 8
        cigar_buf = (ctypes.c_uint32 * cap)()
        rc = lib.helen_ssw_align(
            self._ref, len(self._ref), q, len(q),
            self.match, self.mismatch, self.gap_open, self.gap_extend,
            int(mask_len), 1 if filter.report_cigar else 0,
            ctypes.byref(out), cigar_buf, cap,
        )
        if rc != 0:
            return False
        alignment.best_score = out.score
        alignment.best_score2 = out.score2
        alignment.reference_begin = out.ref_begin
        alignment.reference_end = out.ref_end
        alignment.query_begin = out.query_begin
        alignment.query_end = out.query_end
        alignment.ref_end_next_best = out.ref_end2
        if filter.report_cigar and out.score > 0:
            ops = [(cigar_buf[i] >> 4, _OP_CHARS.get(cigar_buf[i] & 0xF, "M"))
                   for i in range(max(0, out.cigar_len))]
            alignment.cigar, alignment.cigar_string, alignment.mismatches = (
                self._convert(ops, q, out)
            )
        return True

    def _convert(
        self, ops: List[Tuple[int, str]], query: bytes, out: HelenAlignmentStruct
    ) -> Tuple[List[int], str, int]:
        """Add soft clips and split M into '='/'X' runs, as the reference C++
        wrapper does (ssw_cpp.cpp ConvertAlignment)."""
        ref = self._ref
        full: List[Tuple[int, str]] = []
        if out.query_begin > 0:
            full.append((out.query_begin, "S"))
        ri, qi = out.ref_begin, out.query_begin
        mismatches = 0
        for length, op in ops:
            if op == "M":
                run_len = 0
                run_op = ""
                for _ in range(length):
                    cur = "=" if ref[ri] == query[qi] else "X"
                    if cur == "X":
                        mismatches += 1
                    if cur == run_op:
                        run_len += 1
                    else:
                        if run_len:
                            full.append((run_len, run_op))
                        run_op, run_len = cur, 1
                    ri += 1
                    qi += 1
                if run_len:
                    full.append((run_len, run_op))
            elif op == "I":
                full.append((length, "I"))
                qi += length
                # the reference counts indel bases as mismatches too
                # (ssw_cpp.cpp CalculateNumberMismatch, :182 and :188)
                mismatches += length
            elif op == "D":
                full.append((length, "D"))
                ri += length
                mismatches += length
        tail = len(query) - out.query_end - 1
        if tail > 0:
            full.append((tail, "S"))
        code = {"M": 0, "I": 1, "D": 2, "S": 4, "=": 7, "X": 8}
        bam = [(l << 4) | code[o] for l, o in full]
        return bam, "".join(f"{l}{o}" for l, o in full), mismatches
