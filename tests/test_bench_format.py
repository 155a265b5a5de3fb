"""bench.py harness v5 stdout contract (r11 verdict #2): the driver
records only the LAST ~2000 chars of bench stdout, and every BENCH
artifact through r11 shipped ``"parsed": null`` because the single rich
summary line overflowed that capture. v5 prints ONE compact line that
must fit the capture whole — these tests pin the line format so a future
bench-set growth can't silently reintroduce the truncation. Pure Python,
no Spark."""

import importlib.util
import json
import os


def _load_bench():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"
    )
    spec = importlib.util.spec_from_file_location("bench_module", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _rich(n_queries: int, name_len: int = 28) -> dict:
    names = [f"q{str(i).zfill(3)}_{'x' * (name_len - 5)}" for i in range(n_queries)]
    return {
        "metric": "headline_queries_total_wall",
        "value": 12.3456,
        "unit": "sec",
        "harness": {"runs": 5, "warmup": 1, "gc_barrier": True, "version": 5},
        "spread": {n: {"min": 0.1234, "max": 9.8765, "runs": 5} for n in names},
        "control2": {
            "median": 1.0421, "min": 0.98, "max": 1.2, "runs": 5,
            "rows": 200_000_000, "kind": "shuffle_agg",
        },
        "control": {
            "median": 1.3342, "min": 1.2, "max": 1.5, "runs": 5,
            "rows": 1_000_000_000,
        },
        "queries": {n: 0.5678 for n in names},
        "sf": 0.1,
    }


def test_compact_line_fits_tail_capture_at_current_bench_size():
    bench = _load_bench()
    # 24 bench queries is the r11 set size; 20-char names ~ the real
    # average (the guard drops spread for pathological name growth)
    line = bench.compact_summary(_rich(24, name_len=20))
    assert len(line) <= bench._STDOUT_BUDGET
    # tail-capture simulation: the last 2000 chars ARE the whole line
    assert json.loads(line[-2000:]) == json.loads(line)


def test_compact_line_parses_and_keeps_contract_keys():
    bench = _load_bench()
    # 20-char names ~ the real bench set's average; the 28-char case in
    # the overflow test below exercises the drop-spread guard instead
    doc = json.loads(bench.compact_summary(_rich(24, name_len=20)))
    for key in ("metric", "value", "unit", "queries", "sf"):
        assert key in doc
    assert doc["control"]["median"] == 1.3342
    assert doc["control2"]["rows"] == 200_000_000
    assert len(doc["queries"]) == 24
    # spread travels as [min, max] arrays in the compact layout
    assert all(isinstance(v, list) and len(v) == 2 for v in doc["spread"].values())


def test_load_bearing_blocks_ordered_last():
    bench = _load_bench()
    line = bench.compact_summary(_rich(24))
    # bulky-first / load-bearing-last: even if a future overflow slipped
    # through, a tail capture keeps controls + medians for bench_diff's
    # salvage (same guarantee the v3/v4 rich line made)
    assert line.find('"spread"') < line.find('"control"')
    assert line.find('"control"') < line.find('"queries"')
    assert line.rfind('"sf"') > line.rfind('"queries"')


def test_overflow_drops_spread_never_queries():
    bench = _load_bench()
    # 30 queries at 28-char names: over budget with spread, comfortably
    # under once spread drops (the 80x40 case now escalates further —
    # see the staged-overflow test below)
    line = bench.compact_summary(_rich(30, name_len=28))
    doc = json.loads(line)
    assert len(line) <= bench._STDOUT_BUDGET
    assert "spread" not in doc
    assert doc["harness"]["spread_dropped"] is True
    assert "medians_rounded" not in doc["harness"]
    assert len(doc["queries"]) == 30
    assert doc["control2"]["median"] == 1.0421


def test_overflow_stages_round_medians_then_fail_loudly():
    """r12 advice: dropping spread used to be the ONLY fallback — a set
    whose controls+medians alone exceed the budget silently overflowed
    the driver's tail capture again (parsed:null). Now the budget is
    re-checked after the drop: first the query/value medians round to 2
    decimals (recorded as harness.medians_rounded), and a set that
    cannot fit even then raises with the byte count instead of printing
    a line the capture will truncate. Sizes are found empirically so the
    test tracks the real byte layout, not hand arithmetic."""
    import pytest

    bench = _load_bench()
    rounded_n = fail_n = None
    for n in range(24, 200):
        try:
            doc = json.loads(bench.compact_summary(_rich(n, name_len=28)))
        except RuntimeError:
            fail_n = n
            break
        if "medians_rounded" in doc["harness"] and rounded_n is None:
            rounded_n = n
    assert rounded_n is not None and fail_n is not None and rounded_n < fail_n
    line = bench.compact_summary(_rich(rounded_n, name_len=28))
    doc = json.loads(line)
    # the post-drop, post-round line actually FITS — the docstring's
    # 'guaranteed to fit' claim, asserted after every fallback stage
    assert len(line) <= bench._STDOUT_BUDGET
    assert doc["harness"]["spread_dropped"] is True
    assert doc["harness"]["medians_rounded"] == 2
    assert len(doc["queries"]) == rounded_n  # queries never dropped
    assert all(v == 0.57 for v in doc["queries"].values())
    with pytest.raises(RuntimeError, match="outgrew"):
        bench.compact_summary(_rich(fail_n, name_len=28))


def test_bench_diff_reads_compact_artifact():
    """End-to-end: a driver-style artifact whose tail IS the compact line
    must load with medians AND spreads (arrays normalized to min/max)."""
    import sys
    import importlib.util as ilu

    bench = _load_bench()
    bd_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "bench_diff.py",
    )
    spec = ilu.spec_from_file_location("bench_diff_v5", bd_path)
    bd = ilu.module_from_spec(spec)
    spec.loader.exec_module(bd)

    line = bench.compact_summary(_rich(24, name_len=20))
    import tempfile

    with tempfile.NamedTemporaryFile(
        "w", suffix=".json", delete=False, encoding="utf-8"
    ) as f:
        # the driver wraps the tail; parsed is the compact doc itself
        json.dump({"n": 24, "rc": 0, "tail": line, "parsed": json.loads(line)}, f)
        path = f.name
    try:
        q, s, ctrls, salvaged = bd.load(path)
        assert salvaged is False
        assert len(q) == 24
        assert all(set(v) == {"min", "max", "runs"} for v in s.values())
        assert next(iter(s.values()))["min"] == 0.123
        assert ctrls["control2"]["rows"] == 200_000_000
        # salvage path: parsed == null, only the tail survives
        with open(path, "w", encoding="utf-8") as f2:
            json.dump({"n": 24, "rc": 0, "tail": line[-2000:], "parsed": None}, f2)
        q2, s2, ctrls2, salvaged2 = bd.load(path)
        assert salvaged2 is True
        assert q2 == q
        assert {n: (v["min"], v["max"]) for n, v in s2.items()} == {
            n: (v["min"], v["max"]) for n, v in s.items()
        }
        assert ctrls2["control2"]["median"] == ctrls["control2"]["median"]
    finally:
        os.unlink(path)
        if "bench_diff_v5" in sys.modules:
            del sys.modules["bench_diff_v5"]


def test_paired_rule_flags_regression_hidden_by_fast_old_host(tmp_path, capsys):
    """r11 verdict #6: old capture in a fast-host window (drift > 1
    inflates the drift-adjusted old median past the regressed new min) —
    the min-rule excuses it, the paired rule must not."""
    import importlib.util as ilu

    bd_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "bench_diff.py",
    )
    spec = ilu.spec_from_file_location("bench_diff_paired", bd_path)
    bd = ilu.module_from_spec(spec)
    spec.loader.exec_module(bd)

    def artifact(name, qmed, qmin, qmax, cmed):
        doc = {
            "queries": {"q": qmed},
            "spread": {"q": {"min": qmin, "max": qmax, "runs": 5}},
            "control2": {"median": cmed, "rows": 200_000_000},
            "sf": 0.1,
        }
        p = tmp_path / name
        p.write_text(json.dumps({"parsed": doc}))
        return str(p)

    # old capture in a fast-host window: drift 1.65x inflates om_adj to
    # 1.65, just above the regressed new min 1.6 — the min-rule stays
    # silent. But raw ratio 2.0x > 1.15, normalized 2.0/1.65 = 1.21 >
    # 1.15, and new_min 1.6 > old_max 1.1 — paired rule fires.
    old = artifact("old.json", 1.0, 0.95, 1.1, 1.0)
    new = artifact("new.json", 2.0, 1.6, 2.1, 1.65)
    assert bd.main(old, new) == 0
    out = capsys.readouterr().out
    assert "REGRESSED(paired)" in out
    assert "or paired rule): 1" in out

    # control: the same drift with a query that merely tracked the host
    # (ratio 1.65x raw, 1.0x normalized) must stay ~noise
    old2 = artifact("old2.json", 1.0, 0.95, 1.1, 1.0)
    new2 = artifact("new2.json", 1.65, 1.6, 1.7, 1.65)
    assert bd.main(old2, new2) == 0
    out2 = capsys.readouterr().out
    q_line = next(line for line in out2.splitlines() if line.startswith("q "))
    assert q_line.endswith("~noise"), q_line
    assert "or paired rule): 0" in out2


def test_raw_faster_query_never_flagged_regressed(tmp_path, capsys):
    """r12: when the control speeds up far more than the workload (the
    over-tracking SCALE.md documents; measured r12: control2 0.59x vs
    workload 0.81x), the drift-adjusted old median collapses below even
    an improved query's min — the min-rule used to mass-flag raw-FASTER
    queries as REGRESSED. Raw-worse is now necessary for any REGRESSED
    verdict; the lagged-control case is labeled distinctly."""
    import importlib.util as ilu

    bd_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts", "bench_diff.py",
    )
    spec = ilu.spec_from_file_location("bench_diff_rawfaster", bd_path)
    bd = ilu.module_from_spec(spec)
    spec.loader.exec_module(bd)

    def artifact(name, qmed, qmin, qmax, cmed):
        doc = {
            "queries": {"q": qmed},
            "spread": {"q": {"min": qmin, "max": qmax, "runs": 5}},
            "control2": {"median": cmed, "rows": 200_000_000},
            "sf": 0.1,
        }
        p = tmp_path / name
        p.write_text(json.dumps({"parsed": doc}))
        return str(p)

    # host 1.7x faster (control2 1.0 -> 0.59); query 1.2x faster raw
    # (1.0 -> 0.83, min 0.80 > om_adj 0.59): lagged the control but
    # IMPROVED in absolute terms — must not count as a regression
    old = artifact("old.json", 1.0, 0.95, 1.1, 1.0)
    new = artifact("new.json", 0.83, 0.80, 0.90, 0.59)
    assert bd.main(old, new) == 0
    out = capsys.readouterr().out
    q_line = next(line for line in out.splitlines() if line.startswith("q "))
    assert q_line.endswith("~noise (lagged control)"), q_line
    assert "or paired rule): 0" in out

    # the same shape with the query actually SLOWER raw stays REGRESSED
    old2 = artifact("old2.json", 1.0, 0.95, 1.1, 1.0)
    new2 = artifact("new2.json", 1.3, 1.25, 1.4, 1.0)
    assert bd.main(old2, new2) == 0
    out2 = capsys.readouterr().out
    q2 = next(line for line in out2.splitlines() if line.startswith("q "))
    assert q2.endswith("REGRESSED"), q2
