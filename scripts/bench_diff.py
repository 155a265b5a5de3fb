#!/usr/bin/env python
"""Compare two driver bench artifacts (BENCH_r0N.json) per query.

Round-5 verdict #3: claims about bench results must be computed from the
driver JSONs, not from clean-machine runs. This prints, for every query in
either file, the old/new medians and mins and a verdict per the spread
rule documented in bench.py/SCALE.md:

  REGRESSED   min_new > median_old   (the whole new spread sits above the
                                      old typical run — real, not noise)
  IMPROVED    max_new < median_old   (the whole new spread sits below)
  ~noise      otherwise              (spreads overlap)

Usage: python scripts/bench_diff.py BENCH_r04.json BENCH_r05.json
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> tuple[dict[str, float], dict[str, dict[str, float]]]:
    with open(path, encoding="utf-8") as f:
        raw = json.load(f)
    parsed = raw.get("parsed", raw)  # driver artifacts nest under "parsed"
    return parsed.get("queries", {}), parsed.get("spread", {})


def main(old_path: str, new_path: str) -> int:
    old_q, old_s = load(old_path)
    new_q, new_s = load(new_path)
    names = sorted(set(old_q) | set(new_q))
    width = max((len(n) for n in names), default=10)
    print(
        f"{'query':<{width}}  {'old_med':>8} {'old_min':>8}  "
        f"{'new_med':>8} {'new_min':>8}  {'ratio':>6}  verdict"
    )
    n_reg = 0
    for n in names:
        om, nm = old_q.get(n), new_q.get(n)
        omin = old_s.get(n, {}).get("min")
        nmin = new_s.get(n, {}).get("min")
        nmax = new_s.get(n, {}).get("max")
        if om is None or nm is None:
            tag = "old-only" if nm is None else "new-only"
            print(
                f"{n:<{width}}  {_f(om):>8} {_f(omin):>8}  "
                f"{_f(nm):>8} {_f(nmin):>8}  {'':>6}  {tag}"
            )
            continue
        ratio = nm / om if om else float("inf")
        if nmin is not None and nmin > om:
            verdict, n_reg = "REGRESSED", n_reg + 1
        elif nmax is not None and nmax < om:
            verdict = "IMPROVED"
        else:
            verdict = "~noise"
        print(
            f"{n:<{width}}  {_f(om):>8} {_f(omin):>8}  "
            f"{_f(nm):>8} {_f(nmin):>8}  {ratio:>5.2f}x  {verdict}"
        )
    shared = [n for n in names if n in old_q and n in new_q]
    if shared:
        so, sn = sum(old_q[n] for n in shared), sum(new_q[n] for n in shared)
        print(
            f"\nshared {len(shared)} queries: {so:.2f}s -> {sn:.2f}s "
            f"({sn / so:.2f}x); REGRESSED (min_new > median_old): {n_reg}"
        )
    return 0


def _f(v) -> str:
    return f"{v:.3f}" if isinstance(v, (int, float)) else "-"


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
