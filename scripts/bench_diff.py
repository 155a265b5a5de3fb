#!/usr/bin/env python
"""Compare two driver bench artifacts (BENCH_r0N.json) per query.

Round-5 verdict #3: claims about bench results must be computed from the
driver JSONs, not from clean-machine runs. This prints, for every query in
either file, the old/new medians and mins and a verdict per the spread
rule documented in bench.py/SCALE.md:

  REGRESSED   min_new > median_old   (the whole new spread sits above the
                                      old typical run — real, not noise)
  REGRESSED(paired)  raw AND drift-normalized ratio both > 1.15x AND
                     min_new > max_old — catches a real regression the
                     min-rule would excuse as host drift when the old
                     capture ran in a fast-host window (r11 verdict #6)
  IMPROVED    max_new < median_old   (the whole new spread sits below)
  ~noise      otherwise              (spreads overlap)

Usage: python scripts/bench_diff.py BENCH_r04.json BENCH_r05.json
       python scripts/bench_diff.py --lagged BENCH_r09.json ... BENCH_r12.json

``--lagged`` (r12 verdict #4): the hardened REGRESSED gate requires
raw-worse, so a real regression smaller than a concurrent host speedup
reads "~noise (lagged control)" forever — a slow creep could hide across
rounds. This mode walks a CHRONOLOGICAL sequence of committed bench
artifacts, computes every consecutive-pair verdict with the exact same
rule as the two-file diff, and flags any query that reads
lagged-control in >= 3 consecutive pair-diffs (a missing read breaks
the streak — absence is not evidence of lag).
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
    # harness v5 compact layout: spread travels as "name":[min,max]
    for m in re.finditer(
        r'"([A-Za-z0-9_]+)":\s*\[\s*(-?\d+(?:\.\d+)?),\s*(-?\d+(?:\.\d+)?)\s*\]',
        tail,
    ):
        spread.setdefault(
            m.group(1),
            {"min": float(m.group(2)), "max": float(m.group(3)), "runs": None},
        )
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
    dict[str, float], dict[str, dict[str, float]], dict[str, dict], bool
]:
    """(queries, spread, controls, salvaged) — controls maps
    "control"/"control2" to {"median", "rows"} for whichever references
    the artifact carries (v3 artifacts have only "control"; v4 adds the
    Spark-shaped "control2"); salvaged=True means the medians/spreads
    were regex-recovered from a truncated tail capture (parsed: null)
    and may be incomplete."""
    with open(path, encoding="utf-8") as f:
        raw = json.load(f)
    parsed = raw.get("parsed", raw)  # driver artifacts nest under "parsed"
    if not isinstance(parsed, dict):  # truncated capture: parsed == null
        q, s = _salvage(str(raw.get("tail", "")))
        return q, s, _salvage_controls(str(raw.get("tail", ""))), True
    controls = {}
    for key in ("control", "control2"):
        c = parsed.get(key)
        if isinstance(c, dict) and c.get("median") is not None:
            controls[key] = {"median": c["median"], "rows": c.get("rows")}
    runs = (parsed.get("harness") or {}).get("runs")
    spread = {
        # harness v5 compact artifacts carry spread as [min, max] arrays
        n: {"min": v[0], "max": v[1], "runs": runs}
        if isinstance(v, (list, tuple)) and len(v) == 2
        else v
        for n, v in (parsed.get("spread") or {}).items()
    }
    return parsed.get("queries", {}), spread, controls, False


def _salvage_controls(tail: str) -> dict[str, dict]:
    """Recover both control blocks from a truncated tail, each scoped to
    its own braces (a global "rows" search would read control2's rows
    for control, or vice versa, depending on where the cut landed)."""
    out: dict[str, dict] = {}
    for key in ("control", "control2"):
        m = re.search(rf'"{key}":\s*\{{([^}}]*)\}}', tail)
        if not m:
            continue
        body = m.group(1)
        med = re.search(r'"median":\s*(-?\d+(?:\.\d+)?)', body)
        rows = re.search(r'"rows":\s*(\d+)', body)
        if med:
            out[key] = {
                "median": float(med.group(1)),
                "rows": int(rows.group(1)) if rows else None,
            }
    return out


def _drift(old_ctrls: dict, new_ctrls: dict, quiet: bool = False):
    """Host-drift factor between two captures, or None (r8 harness v3;
    control2 preference r11): both artifacts carry constant pure-Spark
    control queries; a control's ratio is the host-speed drift between
    the two captures. Per-query norm ratio = raw ratio / drift. The
    Spark-SHAPED "control2" (shuffle+agg) is preferred when both
    artifacts carry it — r10 forensics showed the v3 hot-loop control
    swinging 0.86x between runs ten minutes apart, noisier than the
    workload it normalizes — with fallback to the v3 "control" for
    r8-r10 artifacts. Only valid when both sides did the SAME work: a
    control resized between harness versions would masquerade as host
    drift."""
    for key in ("control2", "control"):
        oc, nc = old_ctrls.get(key), new_ctrls.get(key)
        if not (oc and nc):
            continue
        if not (oc["median"] > 0 and nc["median"] > 0):
            # a tail capture cut inside the median's digits can salvage
            # 0.0 — treat it as absent rather than dividing by it
            if not quiet:
                print(f"# {key} median unusable in one artifact — skipped")
            continue
        if oc.get("rows") != nc.get("rows"):
            if not quiet:
                print(
                    f"# {key} work differs ({oc.get('rows')} vs "
                    f"{nc.get('rows')} rows) — ratio is not host drift"
                )
            continue
        drift = nc["median"] / oc["median"]
        if not quiet:
            print(
                f"# {key}: old {oc['median']:.3f}s -> new {nc['median']:.3f}s "
                f"(host drift {drift:.2f}x); 'norm' column divides out the drift"
            )
        return drift
    if not quiet and (old_ctrls or new_ctrls):
        print("# no shared same-work control — raw ratios only")
    return None


def _verdict_for(
    om: float,
    nm: float,
    old_sp: dict,
    new_sp: dict,
    drift,
) -> tuple[float, str]:
    """(raw ratio, verdict) for one query present in both artifacts —
    the SINGLE implementation of the spread rule, shared by the
    two-file diff and the --lagged cross-round tracker so the tracker
    can never drift from the gate it audits."""
    omin, omax = old_sp.get("min"), old_sp.get("max")
    nmin, nmax = new_sp.get("min"), new_sp.get("max")
    ratio = nm / om if om else float("inf")
    # Spread rule against the drift-NORMALIZED old median when a control
    # exists: a min that only cleared the old median because the host
    # itself slowed down is not a code regression (and vice versa).
    om_adj = om * drift if drift is not None else om
    # Paired rule (r11 verdict #6): with normalized magnitudes declared
    # direction-only (SCALE.md r11 — the controls over-track host
    # swings), the min-rule alone lets a real regression hide when the
    # OLD capture ran in a fast-host window (drift > 1 inflates om_adj
    # past the regressed new min). Flag it anyway when the move is
    # large in BOTH the raw and the drift-normalized readings AND the
    # whole new spread sits above the whole old spread — three
    # independent signals a noise swing doesn't produce together.
    paired = (
        drift is not None
        and ratio > 1.15
        and ratio / drift > 1.15
        and nmin is not None
        and omax is not None
        and nmin > omax
    )
    # Raw-worse AND min-worse are NECESSARY for any REGRESSED verdict
    # (r12): when the host speeds up far more than the workload
    # (controls over-track host swings — SCALE.md r11; measured r12:
    # control2 0.59x vs workload 0.81x), om_adj collapses below even
    # an IMPROVED query's min and the min-rule mass-flags raw-faster
    # queries. "Didn't keep up with the control" is not a regression:
    # the gate fires only when the new median is slower raw AND the
    # new MIN cleared the old min — bench.py's own documented reading
    # ("a regression whose MIN also moved is real; one visible only
    # in median/max is noise").
    min_worse = omin is None or (nmin is not None and nmin > omin)
    if ratio > 1 and min_worse and nmin is not None and nmin > om_adj:
        return ratio, "REGRESSED"
    if paired:
        return ratio, "REGRESSED(paired)"
    if nmax is not None and nmax < om_adj:
        return ratio, "IMPROVED"
    if ratio <= 1 and nmin is not None and nmin > om_adj:
        return ratio, "~noise (lagged control)"
    return ratio, "~noise"


def main(old_path: str, new_path: str) -> int:
    old_q, old_s, old_ctrls, old_salvaged = load(old_path)
    new_q, new_s, new_ctrls, _ = load(new_path)
    # r12 verdict #3: a pre-v5 (or truncation-salvaged) OLD artifact can
    # carry medians without per-query min/max — min_worse then defaults
    # to True and REGRESSED can fire on median-only evidence (the
    # r11->r12 dedup_paragraphs flag). Say so loudly up front.
    incomplete = [
        n for n in old_q
        if n in new_q and old_s.get(n, {}).get("min") is None
    ]
    if incomplete:
        why = (
            "salvaged from a truncated tail (pre-v5 capture)"
            if old_salvaged else "old artifact carries no per-query spread"
        )
        print(
            f"# WARNING: old spread incomplete for {len(incomplete)}/"
            f"{len([n for n in old_q if n in new_q])} shared queries "
            f"({why}): min/max rules degraded — REGRESSED can fire on "
            "median-only evidence; adjudicate against a same-host pair"
        )
    drift = _drift(old_ctrls, new_ctrls)
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
        ratio, verdict = _verdict_for(
            om, nm, old_s.get(n, {}), new_s.get(n, {}), drift
        )
        n_reg += verdict.startswith("REGRESSED")
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
            f"REGRESSED (min_new > drift-adj median_old, or paired rule): {n_reg}"
        )
    return 0


def _f(v) -> str:
    return f"{v:.3f}" if isinstance(v, (int, float)) else "-"


def track_lagged(paths: list[str], k: int = 3) -> int:
    """Cross-round lagged-control tracker (r12 verdict #4): walk the
    given CHRONOLOGICAL bench artifacts, compute every consecutive-pair
    verdict with _verdict_for (the same rule as the two-file diff), and
    flag any query reading "~noise (lagged control)" in >= k CONSECUTIVE
    pair-diffs — raw-faster but persistently control-lagging, the one
    shape the per-round raw-worse gate structurally excuses, which could
    hide a slow creep. A pair where the query is missing a median (or
    absent) BREAKS the streak: absence is not evidence of lag. Returns
    the number of flagged queries (also the exit code: nonzero means
    look)."""
    arts = [load(p) for p in paths]
    streak: dict[str, int] = {}
    best: dict[str, int] = {}
    first_at: dict[str, str] = {}
    for i in range(len(paths) - 1):
        old_q, old_s, old_c, _ = arts[i]
        new_q, new_s, new_c, _ = arts[i + 1]
        drift = _drift(old_c, new_c, quiet=True)
        pair = f"{paths[i]}->{paths[i + 1]}"
        seen = set()
        for n in set(old_q) & set(new_q):
            seen.add(n)
            _, verdict = _verdict_for(
                old_q[n], new_q[n], old_s.get(n, {}), new_s.get(n, {}), drift
            )
            if verdict == "~noise (lagged control)":
                streak[n] = streak.get(n, 0) + 1
                if streak[n] > best.get(n, 0):
                    best[n] = streak[n]
                if streak[n] == 1:
                    first_at[n] = pair
            else:
                streak[n] = 0
        for n in list(streak):
            if n not in seen:
                streak[n] = 0
    flagged = sorted(n for n, b in best.items() if b >= k)
    for n in flagged:
        print(
            f"LAGGED-CONTROL CREEP: {n} read '~noise (lagged control)' in "
            f"{best[n]} consecutive pair-diffs (first at {first_at[n]}) — "
            "raw-faster every round yet persistently behind the control; "
            "profile it against the oldest artifact in the window"
        )
    print(
        f"\nlagged-control tracker: {len(paths)} artifacts, "
        f"{len(paths) - 1} pair-diffs, threshold {k} consecutive; "
        f"flagged: {len(flagged)}"
    )
    return len(flagged)


if __name__ == "__main__":
    argv = sys.argv[1:]
    if argv and argv[0].startswith("--lagged"):
        k = int(argv[0].split("=", 1)[1]) if "=" in argv[0] else 3
        if len(argv) < 3:
            print(__doc__)
            sys.exit(2)
        sys.exit(track_lagged(argv[1:], k=k))
    if len(argv) != 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(argv[0], argv[1]))
