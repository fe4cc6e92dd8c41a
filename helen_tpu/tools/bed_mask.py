"""Mask BED regions of a FASTA with Ns.

Companion to assessment workflows: the reference ships
masked_regions/GRCh38_masked_regions.bed for excluding known-problematic
regions from polishing evaluation; this tool applies such a BED to a FASTA
(e.g. before computing error rates) without needing bedtools.
"""
from __future__ import annotations

import argparse
from helen_tpu.io.fasta import read_fasta, write_fasta
from helen_tpu.tools.quast_sv_extractor import read_bed


def mask_fasta(in_fasta: str, bed: str, out_fasta: str) -> int:
    """Replace BED intervals with Ns; returns total masked bases."""
    intervals = read_bed(bed)
    masked = 0

    def records():
        nonlocal masked
        for name, seq in read_fasta(in_fasta):
            if name in intervals:
                chars = list(seq)
                for start, end in intervals[name]:
                    start = max(0, start)
                    end = min(len(chars), end)
                    for i in range(start, end):
                        if chars[i] != "N":
                            chars[i] = "N"
                            masked += 1
                seq = "".join(chars)
            yield name, seq

    write_fasta(out_fasta, records())
    return masked


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="mask BED regions of a FASTA with Ns")
    ap.add_argument("-i", "--input_fasta", required=True)
    ap.add_argument("-b", "--bed", required=True)
    ap.add_argument("-o", "--output_fasta", required=True)
    args = ap.parse_args(argv)
    n = mask_fasta(args.input_fasta, args.bed, args.output_fasta)
    print(f"masked {n} bases")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
