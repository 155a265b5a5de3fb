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
import re
import sys


def _salvage(tail: str) -> tuple[dict[str, float], dict[str, dict[str, float]]]:
    """Recover per-query medians/spreads from a truncated driver capture.

    Driver artifacts sometimes ship `"parsed": null` because the tail
    capture cut off the JSON head (BENCH_r06.json did). Two layouts:
    harness <= v2 printed the flat `"name": 1.234` median pairs FIRST
    (before "spread"), so a tail capture loses early-alphabet medians;
    harness v3 prints "queries" LAST for exactly this reason. Handle
    both: when a '"queries"' marker survived, the medians are the flat
    pairs after it; otherwise they are the pairs before "spread".
    Queries whose median was cut are reported as lost.
    """
    not_queries = (
        "n", "rc", "cpus", "sf", "value", "min", "max", "runs",
        "median", "rows", "warmup", "version",
    )
    q_at = tail.find('"queries"')
    if q_at >= 0:
        head = tail[q_at:]
    else:
        spread_at = tail.find('"spread"')
        head = tail if spread_at < 0 else tail[:spread_at]
    queries = {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"([A-Za-z0-9_]+)":\s*(-?\d+(?:\.\d+)?)', head)
        if m.group(1) not in not_queries
    }
    spread: dict[str, dict[str, float]] = {}
    for m in re.finditer(
        r'"([A-Za-z0-9_]+)":\s*\{\s*"min":\s*(-?\d+(?:\.\d+)?),\s*'
        r'"max":\s*(-?\d+(?:\.\d+)?),\s*"runs":\s*(\d+)', tail
    ):
        spread[m.group(1)] = {
            "min": float(m.group(2)),
            "max": float(m.group(3)),
            "runs": int(m.group(4)),
        }
    lost = sorted(set(spread) - set(queries))
    if lost:
        print(
            f"# WARNING: artifact truncated — {len(lost)} queries have spread "
            f"but lost their median to truncation: {', '.join(lost)}",
            file=sys.stderr,
        )
    return queries, spread


def load(
    path: str,
) -> tuple[
    dict[str, float], dict[str, dict[str, float]], float | None, int | None
]:
    with open(path, encoding="utf-8") as f:
        raw = json.load(f)
    parsed = raw.get("parsed", raw)  # driver artifacts nest under "parsed"
    if not isinstance(parsed, dict):  # truncated capture: parsed == null
        q, s = _salvage(str(raw.get("tail", "")))
        ctrl, rows = _salvage_control(str(raw.get("tail", "")))
        return q, s, ctrl, rows
    control = parsed.get("control") or {}
    return (
        parsed.get("queries", {}),
        parsed.get("spread", {}),
        control.get("median"),
        control.get("rows"),
    )


def _salvage_control(tail: str) -> tuple[float | None, int | None]:
    m = re.search(r'"control":\s*\{\s*"median":\s*(-?\d+(?:\.\d+)?)', tail)
    rows = re.search(r'"rows":\s*(\d+)', tail)
    return (
        float(m.group(1)) if m else None,
        int(rows.group(1)) if rows else None,
    )


def main(old_path: str, new_path: str) -> int:
    old_q, old_s, old_ctrl, old_rows = load(old_path)
    new_q, new_s, new_ctrl, new_rows = load(new_path)
    # Host-drift normalization (r8, harness v3): both artifacts carry a
    # constant pure-Spark control query; its ratio is the host-speed drift
    # between the two captures. Per-query norm ratio = raw ratio / drift.
    # Only valid when both controls did the SAME work: a control resized
    # between harness versions would masquerade as host drift.
    drift = (new_ctrl / old_ctrl) if (old_ctrl and new_ctrl) else None
    if drift is not None and old_rows != new_rows:
        print(
            f"# control work differs ({old_rows} vs {new_rows} rows) — "
            "ratio is not host drift; raw ratios only"
        )
        drift = None
    elif drift is not None:
        print(
            f"# control: old {old_ctrl:.3f}s -> new {new_ctrl:.3f}s "
            f"(host drift {drift:.2f}x); 'norm' column divides out the drift"
        )
    elif old_ctrl or new_ctrl:
        print("# control present in only one artifact — raw ratios only")
    names = sorted(set(old_q) | set(new_q) | set(old_s) | set(new_s))
    width = max((len(n) for n in names), default=10)
    norm_hdr = f"  {'norm':>6}" if drift is not None else ""
    print(
        f"{'query':<{width}}  {'old_med':>8} {'old_min':>8}  "
        f"{'new_med':>8} {'new_min':>8}  {'ratio':>6}{norm_hdr}  verdict"
    )
    n_reg = 0
    for n in names:
        om, nm = old_q.get(n), new_q.get(n)
        omin = old_s.get(n, {}).get("min")
        nmin = new_s.get(n, {}).get("min")
        nmax = new_s.get(n, {}).get("max")
        if om is None or nm is None:
            # A truncated artifact can lose the median but keep the spread:
            # still run the spread-rule check against the other side's median.
            if nm is None and om is not None and nmin is not None:
                # same drift-adjusted rule as the full-data branch below
                om_t = om * drift if drift is not None else om
                verdict = "REGRESSED*" if nmin > om_t else (
                    "IMPROVED*" if nmax is not None and nmax < om_t else "~noise*"
                )
                n_reg += verdict == "REGRESSED*"
                tag = f"{verdict} (new median truncated)"
            elif n not in old_q and n not in old_s:
                tag = "new-only"
            elif n not in new_q and n not in new_s:
                tag = "old-only"
            else:
                tag = "median-truncated"
            print(
                f"{n:<{width}}  {_f(om):>8} {_f(omin):>8}  "
                f"{_f(nm):>8} {_f(nmin):>8}  {'':>6}  {tag}"
            )
            continue
        ratio = nm / om if om else float("inf")
        # Spread rule against the drift-NORMALIZED old median when a control
        # exists: a min that only cleared the old median because the host
        # itself slowed down is not a code regression (and vice versa).
        om_adj = om * drift if drift is not None else om
        if nmin is not None and nmin > om_adj:
            verdict, n_reg = "REGRESSED", n_reg + 1
        elif nmax is not None and nmax < om_adj:
            verdict = "IMPROVED"
        else:
            verdict = "~noise"
        norm_col = f"  {ratio / drift:>5.2f}x" if drift is not None else ""
        print(
            f"{n:<{width}}  {_f(om):>8} {_f(omin):>8}  "
            f"{_f(nm):>8} {_f(nmin):>8}  {ratio:>5.2f}x{norm_col}  {verdict}"
        )
    shared = [n for n in names if n in old_q and n in new_q]
    if shared:
        so, sn = sum(old_q[n] for n in shared), sum(new_q[n] for n in shared)
        norm_note = (
            f" (drift-normalized {sn / so / drift:.2f}x)" if drift is not None else ""
        )
        print(
            f"\nshared {len(shared)} queries: {so:.2f}s -> {sn:.2f}s "
            f"({sn / so:.2f}x){norm_note}; "
            f"REGRESSED (min_new > drift-adj median_old): {n_reg}"
        )
    return 0


def _f(v) -> str:
    return f"{v:.3f}" if isinstance(v, (int, float)) else "-"


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
