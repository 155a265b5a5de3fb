"""bench_diff.py control-normalization logic (r8 harness v3): pure
Python, no Spark — the drift factor, the normalized ratio column, and
the spread rule against the drift-adjusted old median."""

import importlib.util
import json
import os
import sys


def _load_bench_diff():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "bench_diff.py",
    )
    spec = importlib.util.spec_from_file_location("bench_diff", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _artifact(tmp_path, name, queries, spread, control=None):
    doc = {"queries": queries, "spread": spread, "sf": 0.1}
    if control is not None:
        doc["control"] = control
    p = tmp_path / name
    p.write_text(json.dumps({"parsed": doc}))
    return str(p)


def test_drift_normalization_declassifies_host_slowdown(tmp_path, capsys):
    bd = _load_bench_diff()
    # host got 1.5x slower (control 1.0 -> 1.5); query q scaled exactly
    # with the host: raw ratio 1.5x and min_new > median_old, which the
    # raw rule would flag REGRESSED — the drift-adjusted rule must not.
    old = _artifact(
        tmp_path, "old.json",
        {"q": 1.0}, {"q": {"min": 0.95, "max": 1.1, "runs": 5}},
        control={"median": 1.0, "min": 0.9, "max": 1.1, "runs": 5, "rows": 300000000},
    )
    new = _artifact(
        tmp_path, "new.json",
        {"q": 1.5}, {"q": {"min": 1.4, "max": 1.6, "runs": 5}},
        control={"median": 1.5, "min": 1.4, "max": 1.6, "runs": 5, "rows": 300000000},
    )
    assert bd.main(old, new) == 0
    out = capsys.readouterr().out
    assert "host drift 1.50x" in out
    q_line = next(line for line in out.splitlines() if line.startswith("q "))
    assert q_line.endswith("~noise"), q_line
    assert "1.00x" in q_line  # drift-normalized ratio column
    assert "drift-adj median_old, or paired rule): 0" in out


def test_real_regression_still_flagged_under_stable_control(tmp_path, capsys):
    bd = _load_bench_diff()
    old = _artifact(
        tmp_path, "old.json",
        {"q": 1.0}, {"q": {"min": 0.95, "max": 1.1, "runs": 5}},
        control={"median": 1.0, "min": 0.9, "max": 1.1, "runs": 5, "rows": 300000000},
    )
    new = _artifact(
        tmp_path, "new.json",
        {"q": 2.0}, {"q": {"min": 1.9, "max": 2.2, "runs": 5}},
        control={"median": 1.0, "min": 0.9, "max": 1.1, "runs": 5, "rows": 300000000},
    )
    bd.main(old, new)
    out = capsys.readouterr().out
    assert "host drift 1.00x" in out
    assert "REGRESSED" in out


def test_legacy_artifacts_without_control_keep_raw_rule(tmp_path, capsys):
    bd = _load_bench_diff()
    old = _artifact(
        tmp_path, "old.json",
        {"q": 1.0}, {"q": {"min": 0.95, "max": 1.1, "runs": 5}},
    )
    new = _artifact(
        tmp_path, "new.json",
        {"q": 0.5}, {"q": {"min": 0.45, "max": 0.6, "runs": 5}},
    )
    bd.main(old, new)
    out = capsys.readouterr().out
    assert "host drift" not in out
    assert "IMPROVED" in out


def test_salvage_recovers_control_from_truncated_tail(tmp_path, capsys):
    bd = _load_bench_diff()
    # driver artifacts sometimes capture only the tail: parsed == null
    tail = (
        '"q": 1.5}, "spread": {"q": {"min": 1.4, "max": 1.6, "runs": 5}}, '
        '"control": {"median": 1.5, "min": 1.4, "max": 1.6, "runs": 5, '
        '"rows": 300000000}, "sf": 0.1}'
    )
    p = tmp_path / "trunc.json"
    p.write_text(json.dumps({"parsed": None, "tail": tail}))
    old = _artifact(
        tmp_path, "old.json",
        {"q": 1.0}, {"q": {"min": 0.95, "max": 1.1, "runs": 5}},
        control={"median": 1.0, "min": 0.9, "max": 1.1, "runs": 5, "rows": 300000000},
    )
    bd.main(old, str(p))
    out = capsys.readouterr().out
    assert "host drift 1.50x" in out


def test_salvage_v3_layout_queries_last(tmp_path, capsys):
    """Harness v3 prints medians LAST so a tail capture keeps them: a
    truncated v3 artifact that lost the head (metric/harness/control
    partly cut, early spreads gone) must still yield every median that
    survived after the '\"queries\"' marker."""
    bd = _load_bench_diff()
    # tail of a v3 line: control intact, spread partially cut, then
    # queries + sf fully present
    tail = (
        '"control": {"median": 2.0, "min": 1.9, "max": 2.2, "runs": 5, '
        '"rows": 1000000000}, "spread": {"zz": {"min": 0.9, "max": 1.2, '
        '"runs": 5}}, "queries": {"aa": 1.5, "zz": 1.0}, "sf": 0.1}'
    )
    p = tmp_path / "v3trunc.json"
    p.write_text(json.dumps({"parsed": None, "tail": tail}))
    old = _artifact(
        tmp_path, "old.json",
        {"aa": 1.0, "zz": 1.0},
        {"aa": {"min": 0.95, "max": 1.1, "runs": 5},
         "zz": {"min": 0.95, "max": 1.1, "runs": 5}},
        control={"median": 1.0, "min": 0.9, "max": 1.1, "runs": 5, "rows": 1000000000},
    )
    bd.main(old, str(p))
    out = capsys.readouterr().out
    assert "host drift 2.00x" in out
    aa = next(line for line in out.splitlines() if line.startswith("aa "))
    zz = next(line for line in out.splitlines() if line.startswith("zz "))
    assert "1.500" in aa and "1.000" in zz  # both medians salvaged
    assert "shared 2 queries" in out


def test_resized_control_is_not_treated_as_drift(tmp_path, capsys):
    """A control that did DIFFERENT work in the two artifacts (rows
    changed between harness revisions) must not masquerade as host
    drift: normalization is skipped and raw ratios rule."""
    bd = _load_bench_diff()
    old = _artifact(
        tmp_path, "old.json",
        {"q": 1.0}, {"q": {"min": 0.95, "max": 1.1, "runs": 5}},
        control={"median": 0.3, "min": 0.28, "max": 0.33, "runs": 5,
                 "rows": 300000000},
    )
    new = _artifact(
        tmp_path, "new.json",
        {"q": 1.0}, {"q": {"min": 0.95, "max": 1.1, "runs": 5}},
        control={"median": 0.9, "min": 0.85, "max": 1.0, "runs": 5,
                 "rows": 1000000000},
    )
    bd.main(old, new)
    out = capsys.readouterr().out
    assert "control work differs" in out
    assert "(host drift" not in out  # the normalization factor line
    assert "norm" not in out.splitlines()[1]  # no norm column header


def _artifact2(tmp_path, name, queries, spread, control=None, control2=None):
    doc = {"queries": queries, "spread": spread, "sf": 0.1}
    if control is not None:
        doc["control"] = control
    if control2 is not None:
        doc["control2"] = control2
    p = tmp_path / name
    p.write_text(json.dumps({"parsed": doc}))
    return str(p)


def test_control2_preferred_over_hot_loop_control(tmp_path, capsys):
    """r11 (verdict #5): when both artifacts carry the Spark-shaped
    shuffle+agg control2, drift normalizes on IT — here the noisy v3
    hot-loop control swung 0.7x while control2 (and the queries) stayed
    flat, so a raw or control-normalized diff would invent an
    improvement/regression that control2 correctly reads as none."""
    bd = _load_bench_diff()
    q_old = {"q": 1.0}
    s_old = {"q": {"min": 0.95, "max": 1.05, "runs": 5}}
    q_new = {"q": 1.0}
    s_new = {"q": {"min": 0.96, "max": 1.06, "runs": 5}}
    old = _artifact2(
        tmp_path, "old.json", q_old, s_old,
        control={"median": 1.0, "min": 0.9, "max": 1.1, "runs": 5,
                 "rows": 1000000000},
        control2={"median": 1.0, "min": 0.95, "max": 1.05, "runs": 5,
                  "rows": 200000000, "kind": "shuffle_agg"},
    )
    new = _artifact2(
        tmp_path, "new.json", q_new, s_new,
        control={"median": 0.7, "min": 0.65, "max": 0.78, "runs": 5,
                 "rows": 1000000000},
        control2={"median": 1.0, "min": 0.96, "max": 1.04, "runs": 5,
                  "rows": 200000000, "kind": "shuffle_agg"},
    )
    bd.main(old, new)
    out = capsys.readouterr().out
    assert "# control2: old 1.000s -> new 1.000s (host drift 1.00x)" in out
    assert "~noise" in out
    assert "REGRESSED (min_new > drift-adj median_old, or paired rule): 0" in out


def test_control2_falls_back_to_control_for_v3_artifacts(tmp_path, capsys):
    """A v4 artifact diffed against a v3 one (no control2) falls back to
    the shared hot-loop control."""
    bd = _load_bench_diff()
    old = _artifact2(
        tmp_path, "old.json", {"q": 1.0},
        {"q": {"min": 0.9, "max": 1.1, "runs": 5}},
        control={"median": 1.0, "min": 0.9, "max": 1.1, "runs": 5,
                 "rows": 1000000000},
    )
    new = _artifact2(
        tmp_path, "new.json", {"q": 1.5},
        {"q": {"min": 1.4, "max": 1.6, "runs": 5}},
        control={"median": 1.5, "min": 1.4, "max": 1.6, "runs": 5,
                 "rows": 1000000000},
        control2={"median": 1.0, "min": 0.95, "max": 1.05, "runs": 5,
                  "rows": 200000000, "kind": "shuffle_agg"},
    )
    bd.main(old, new)
    out = capsys.readouterr().out
    assert "# control: old 1.000s -> new 1.500s" in out
    assert "~noise" in out
    assert "REGRESSED (min_new > drift-adj median_old, or paired rule): 0" in out


def test_salvage_scopes_rows_per_control_block(tmp_path, capsys):
    """Truncated v4 tail: each control's rows must parse from ITS OWN
    braces — a global rows search would cross-read between the two
    blocks and spuriously disable (or mis-enable) drift."""
    bd = _load_bench_diff()
    tail = (
        '"runs": 5}}, '
        '"control2": {"median": 2.0, "min": 1.9, "max": 2.1, "runs": 5, '
        '"rows": 200000000, "kind": "shuffle_agg"}, '
        '"control": {"median": 1.0, "min": 0.9, "max": 1.1, "runs": 5, '
        '"rows": 1000000000}, '
        '"queries": {"q": 3.0}, "sf": 0.1}'
    )
    p = tmp_path / "trunc.json"
    p.write_text(json.dumps({"parsed": None, "tail": tail}))
    q, s, ctrls, salvaged = bd.load(str(p))
    assert salvaged is True
    assert q == {"q": 3.0}
    assert ctrls["control2"] == {"median": 2.0, "rows": 200000000}
    assert ctrls["control"] == {"median": 1.0, "rows": 1000000000}


def test_zero_salvaged_control_median_degrades_not_crashes(tmp_path, capsys):
    """r11 review: a tail capture cut inside the median's digits can
    salvage median=0.0 — the diff must skip that control (and fall back
    or print raw ratios), not ZeroDivisionError."""
    bd = _load_bench_diff()
    old = _artifact2(
        tmp_path, "old.json", {"q": 1.0},
        {"q": {"min": 0.9, "max": 1.1, "runs": 5}},
        control={"median": 0.0, "min": 0.0, "max": 0.0, "runs": 5,
                 "rows": 1000000000},
    )
    new = _artifact2(
        tmp_path, "new.json", {"q": 1.0},
        {"q": {"min": 0.9, "max": 1.1, "runs": 5}},
        control={"median": 1.0, "min": 0.9, "max": 1.1, "runs": 5,
                 "rows": 1000000000},
    )
    bd.main(old, new)
    out = capsys.readouterr().out
    assert "# control median unusable" in out
    assert "~noise" in out


def test_incomplete_old_spread_prints_loud_banner(tmp_path, capsys):
    """r12 verdict #3: a pre-v5 OLD artifact with medians but no
    per-query min/max degrades min_worse to always-True — REGRESSED can
    fire on median-only evidence (the r11->r12 dedup_paragraphs flag).
    The diff must say so up front, and the complete-artifact path must
    NOT print the banner."""
    bd = _load_bench_diff()
    old = _artifact(tmp_path, "old.json", {"q": 1.0, "r": 1.0}, {})
    new = _artifact(
        tmp_path, "new.json",
        {"q": 1.5, "r": 1.0},
        {"q": {"min": 1.4, "max": 1.6, "runs": 5},
         "r": {"min": 0.9, "max": 1.1, "runs": 5}},
    )
    bd.main(old, new)
    out = capsys.readouterr().out
    assert "WARNING: old spread incomplete for 2/2 shared queries" in out
    assert "min/max rules degraded" in out
    assert "REGRESSED" in out  # q still flags — banner explains on what basis
    # complete old artifact: no banner
    old2 = _artifact(
        tmp_path, "old2.json", {"q": 1.0, "r": 1.0},
        {"q": {"min": 0.95, "max": 1.1, "runs": 5},
         "r": {"min": 0.95, "max": 1.1, "runs": 5}},
    )
    bd.main(old2, new)
    assert "WARNING: old spread incomplete" not in capsys.readouterr().out


def test_salvaged_old_spread_banner_names_truncation(tmp_path, capsys):
    """The banner distinguishes a truncation-salvaged old side (pre-v5
    tail capture) from an artifact that simply never carried spread."""
    bd = _load_bench_diff()
    p = tmp_path / "trunc_old.json"
    p.write_text(json.dumps({"parsed": None, "tail": '"queries": {"q": 1.0}, "sf": 0.1}'}))
    new = _artifact(
        tmp_path, "new_for_trunc.json",
        {"q": 1.0}, {"q": {"min": 0.9, "max": 1.1, "runs": 5}},
    )
    bd.main(str(p), new)
    out = capsys.readouterr().out
    assert "salvaged from a truncated tail (pre-v5 capture)" in out


def _lagged_artifact(tmp_path, name, q_median, ctrl_median):
    """An artifact whose control runs at ctrl_median: with q constant
    while the control halves, each consecutive pair reads ratio<=1 but
    min above the drift-adjusted old median — '~noise (lagged control)'."""
    return _artifact2(
        tmp_path, name,
        {"q": q_median},
        {"q": {"min": q_median * 0.95, "max": q_median * 1.05, "runs": 5}},
        control2={"median": ctrl_median, "min": ctrl_median * 0.9,
                  "max": ctrl_median * 1.1, "runs": 5, "rows": 50000000},
    )


def test_lagged_control_tracker_flags_persistent_creep(tmp_path, capsys):
    """r12 verdict #4: q raw-flat while the control speeds up 2x every
    round — each per-round diff excuses it as '~noise (lagged control)',
    but 3 consecutive such reads must flag as possible slow creep."""
    bd = _load_bench_diff()
    paths = [
        _lagged_artifact(tmp_path, f"b{i}.json", 1.0, 8.0 / (2 ** i))
        for i in range(4)
    ]
    rc = bd.track_lagged(paths, k=3)
    out = capsys.readouterr().out
    assert rc == 1
    assert "LAGGED-CONTROL CREEP: q" in out
    assert "3 consecutive pair-diffs" in out


def test_lagged_control_tracker_streak_broken_by_clean_read(tmp_path, capsys):
    """Two lagged reads, a clean (stable-control) read, then two more
    lagged reads: no streak reaches 3 — nothing flagged. A missing
    median in one artifact must also break the streak."""
    bd = _load_bench_diff()
    ctrls = [8.0, 4.0, 2.0, 2.0, 1.0, 0.5]  # pair 3 (2.0->2.0) is clean
    paths = [
        _lagged_artifact(tmp_path, f"c{i}.json", 1.0, c)
        for i, c in enumerate(ctrls)
    ]
    rc = bd.track_lagged(paths, k=3)
    out = capsys.readouterr().out
    assert rc == 0
    assert "flagged: 0" in out
    # absence breaks the streak too: drop q's median from the middle artifact
    paths2 = [
        _lagged_artifact(tmp_path, f"d{i}.json", 1.0, 16.0 / (2 ** i))
        for i in range(5)
    ]
    gap = _artifact2(tmp_path, "d2.json", {}, {},
                     control2={"median": 4.0, "min": 3.6, "max": 4.4,
                               "runs": 5, "rows": 50000000})
    paths2[2] = gap
    rc2 = bd.track_lagged(paths2, k=3)
    assert rc2 == 0, capsys.readouterr().out
