"""K-mer-seeded pairwise alignment experiment.

Equivalent of the reference's dev-only PairwiseAlignment.py (modules/python/
PairwiseAlignment.py): finds shared k-mers between two sequences to pick a
candidate anchor window, then runs the native SSW aligner over it. Useful for
probing stitch behavior on hand-picked sequence pairs (the reference's
helper/test_pairwisealigner.py smoke test maps to ``main`` here).
"""
from __future__ import annotations

import argparse
from typing import Dict, List, Optional, Tuple

from helen_tpu.config import STITCH
from helen_tpu.stitch import Aligner, Alignment, Filter


def kmer_index(seq: str, k: int) -> Dict[str, List[int]]:
    out: Dict[str, List[int]] = {}
    for i in range(len(seq) - k + 1):
        out.setdefault(seq[i : i + k], []).append(i)
    return out


def seed_match(seq_a: str, seq_b: str, k: int = STITCH.kmer_size) -> Optional[Tuple[int, int]]:
    """First shared k-mer (pos_a, pos_b), or None."""
    index = kmer_index(seq_a, k)
    for j in range(len(seq_b) - k + 1):
        hits = index.get(seq_b[j : j + k])
        if hits:
            return hits[0], j
    return None


def align_pair(seq_a: str, seq_b: str, cfg=STITCH) -> Alignment:
    aligner = Aligner(cfg.match_score, cfg.mismatch_penalty,
                      cfg.gap_open_penalty, cfg.gap_extend_penalty)
    aligner.SetReferenceSequence(seq_a, len(seq_a))
    alignment = Alignment()
    aligner.Align_cpp(seq_b, Filter(), alignment, 0)
    return alignment


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="k-mer-seeded SSW alignment of two sequences")
    ap.add_argument("seq_a")
    ap.add_argument("seq_b")
    ap.add_argument("-k", "--kmer", type=int, default=STITCH.kmer_size)
    args = ap.parse_args(argv)
    seed = seed_match(args.seq_a, args.seq_b, args.kmer)
    print(f"seed k-mer match: {seed}")
    al = align_pair(args.seq_a, args.seq_b)
    print(f"score={al.best_score} ref=[{al.reference_begin},{al.reference_end}] "
          f"query=[{al.query_begin},{al.query_end}] cigar={al.cigar_string}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
