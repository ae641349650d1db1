"""Diff two bench result JSONs (bench_results.json or a driver BENCH_r{N})
per query: absolute and relative deltas, sorted by regression size.

Usage: python tools/bench_diff.py OLD.json NEW.json [--threshold 0.2]

Accepts either the detailed bench_results.json format or the driver's
one-line {"queries": {...}} format; queries present in only one file are
listed separately.
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> dict[str, float]:
    import re

    with open(path) as f:
        d = json.load(f)
    # driver capture format: {"parsed": {...}|null, "tail": "...truncated"}
    if "parsed" in d or "tail" in d:
        parsed = d.get("parsed")
        if isinstance(parsed, dict) and parsed.get("queries"):
            return {k: float(v) for k, v in parsed["queries"].items()}
        # parsed is null → recover whatever name/number pairs the tail kept
        return {
            m.group(1): float(m.group(2))
            for m in re.finditer(r'"([a-z0-9_]+)":\s*([0-9.]+)', d.get("tail", ""))
            if m.group(1) not in ("value", "sf", "cpus", "n", "rc")
        }
    qs = d.get("queries", d)
    return {k: float(v) for k, v in qs.items() if isinstance(v, (int, float))}


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    thr = 0.2
    if "--threshold" in sys.argv:
        thr = float(sys.argv[sys.argv.index("--threshold") + 1])
    if len(args) != 2:
        print(__doc__)
        return 2
    old, new = load(args[0]), load(args[1])
    common = sorted(set(old) & set(new), key=lambda n: old[n] - new[n])
    print(f"{'query':40s} {'old':>8s} {'new':>8s} {'delta':>8s} {'ratio':>6s}")
    regressions = 0
    for name in common:
        o, n = old[name], new[name]
        ratio = n / o if o else float("inf")
        flag = ""
        if n - o > 0.25 and ratio > 1 + thr:
            flag = "  << regression"
            regressions += 1
        print(f"{name:40s} {o:8.2f} {n:8.2f} {n - o:+8.2f} {ratio:5.2f}x{flag}")
    print(
        f"\ntotal: {sum(old[n] for n in common):.1f}s -> "
        f"{sum(new[n] for n in common):.1f}s over {len(common)} shared queries"
    )
    for label, only in (("only-old", set(old) - set(new)), ("only-new", set(new) - set(old))):
        if only:
            print(f"{label}: {sorted(only)}")
    return 1 if regressions else 0


if __name__ == "__main__":
    raise SystemExit(main())
