"""Reduce pomoxis assess_assembly summaries to one table.

Equivalent of the reference's helper/assess_summary_analyzer.py: collects the
Q-scores / error rates from one or more ``assess_assembly`` summary text
files and prints a comparison table.
"""
from __future__ import annotations

import argparse
import re
from typing import Dict

_PATTERNS = {
    "err_ont": re.compile(r"err_ont\s+([0-9.eE+-]+)"),
    "err_bal": re.compile(r"err_bal\s+([0-9.eE+-]+)"),
    "iden": re.compile(r"iden\s+([0-9.eE+-]+)"),
    "del": re.compile(r"\bdel\s+([0-9.eE+-]+)"),
    "ins": re.compile(r"\bins\s+([0-9.eE+-]+)"),
    "Qscore": re.compile(r"Q(?:score)?[:\s]+([0-9.]+)"),
}


def parse_summary(path: str) -> Dict[str, float]:
    text = open(path).read()
    out = {}
    for key, pat in _PATTERNS.items():
        m = pat.search(text)
        if m:
            out[key] = float(m.group(1))
    if "Qscore" not in out and "err_ont" in out and out["err_ont"] > 0:
        import math

        out["Qscore"] = -10.0 * math.log10(out["err_ont"])
    return out


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description="summarize assess_assembly outputs")
    ap.add_argument("summaries", nargs="+", help="assess summary text files")
    args = ap.parse_args(argv)
    keys = ["err_ont", "err_bal", "iden", "del", "ins", "Qscore"]
    print(f"{'file':<40}" + "".join(f"{k:>10}" for k in keys))
    for path in args.summaries:
        stats = parse_summary(path)
        row = "".join(
            f"{stats[k]:>10.4g}" if k in stats else f"{'-':>10}" for k in keys
        )
        print(f"{path:<40}{row}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
