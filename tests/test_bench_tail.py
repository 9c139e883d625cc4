"""The bench artifact's capture-budget contract (r12 verdict item 1).

The driver records only the LAST 2,000 characters of bench.py's stdout
(front-truncated). BENCH_r12 measured the real arithmetic: the final
headline line alone was 1,491 chars, so only ~500 chars of auxiliary
records survived — losing every queries_min floors chunk and the heavy
digests' member pricing. These tests pin the r13 layout against the
REAL registry (not a synthetic one), so registry growth that would blow
the budget fails HERE at development time instead of silently clipping
the next round's artifact.

No SparkSession needed: _tail_lines / _contended / _prior_round_floors
are pure functions over dicts.
"""

from __future__ import annotations

import importlib.util
import json
import os

import pytest

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench_under_test", os.path.join(_HERE, "bench.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


bench = _load_bench()


def _registry_names() -> list[str]:
    import __spark_entry__ as entrymod

    return list(entrymod.queries())


def _group_specs() -> dict:
    from dbt_jaffleshop_spark.queries.op_digests import _GROUP_SPECS

    return _GROUP_SPECS


def _realistic_inputs():
    """Worst-plausible shapes from the REAL registry: every query at a
    3-digit-seconds median (the r12 contended run hit 103 s totals),
    every digest group priced (all members), launch telemetry present,
    contended flag set — the longest final line this registry can emit."""
    names = _registry_names() + ["pipeline_build"]
    timings = {n: round(100.0 + i * 1.37, 2) for i, n in enumerate(names)}
    mins = {n: round(v * 0.91, 2) for n, v in timings.items()}
    digest_members = {
        g: {m: round(41.27 + j, 2) for j, m in enumerate(members)}
        for g, members in _group_specs().items()
    }
    final_rec = {
        "metric": "headline_queries_total",
        "value": round(sum(timings.values()), 2),
        "unit": "sec",
        "queries": {n: round(v, 1) for n, v in timings.items()},
        "sf": 0.1,
        "protocol": "noop-write; warmup+median of 3",
        "launch_load": 41.6,
        "contended": True,
        "retry_rows": len(names),
        "suspect_rows": len(names),
    }
    return timings, mins, digest_members, final_rec


def test_budget_holds_for_real_registry_strict():
    """(c) of the r12 verdict item 1: the self-check, run strict against
    the real registry at worst-plausible magnitudes. If adding a query
    or digest member makes the pair outgrow the capture, THIS fails."""
    timings, mins, dm, final_rec = _realistic_inputs()
    suspect = {n: [timings[n], round(timings[n] / 3, 2)] for n in timings}
    lines = bench._tail_lines(
        timings, mins, dm, final_rec, strict=True, suspect=suspect
    )
    assert len(lines[-2]) + len(lines[-1]) <= 1900


def test_suspect_rows_line_sits_before_the_budgeted_pair():
    """Unrecovered-retry rows are marked machine-readably: the aux line
    carries [recorded, prior_floor] per row and prints immediately
    before the tail_summary/final pair (it survives whenever the
    suspect set is small; the count always survives in the final
    line)."""
    timings, mins, dm, final_rec = _realistic_inputs()
    suspect = {"streaming_attribution": [25.73, 5.79]}
    lines = bench._tail_lines(
        timings, mins, dm, final_rec, suspect=suspect
    )
    rec = json.loads(lines[-3])
    assert rec["metric"] == "suspect_rows"
    assert rec["rows"] == suspect
    assert json.loads(lines[-2])["metric"] == "tail_summary"
    # ... and with no suspects, no line at all
    lines2 = bench._tail_lines(timings, mins, dm, final_rec, suspect={})
    assert json.loads(lines2[-3])["metric"] == "digest_members"


def test_tail_summary_carries_every_digest_floor_and_top_members():
    """Done-criterion of the r12 verdict: the captured tail must contain
    a parseable acid-digest-class member breakdown AND a floor for every
    digest row. Simulated against the literal 2,000-char capture."""
    timings, mins, dm, final_rec = _realistic_inputs()
    lines = bench._tail_lines(timings, mins, dm, final_rec)
    captured = "\n".join(lines)[-2000:]
    summary = None
    for line in captured.splitlines():
        if line.startswith('{"metric":"tail_summary"'):
            summary = json.loads(line)  # fully intact, not clipped
    assert summary is not None
    digest_rows = [
        n for n in timings if n.endswith("_digest") or n == "pipeline_build"
    ]
    fkeys = bench._floor_keys(digest_rows)
    assert set(summary["floors"]) == {fkeys[n] for n in digest_rows}
    # the TOP-cost priced digest is the one whose members are folded in
    top = max(dm, key=lambda g: timings[g])
    assert summary["top_digest"] == top
    assert summary["members"]  # at least the heaviest members survive
    assert set(summary["members"]) <= set(dm[top])
    # heaviest-first retention: whatever was trimmed was the cheapest
    kept_costs = [dm[top][m] for m in summary["members"]]
    dropped = [dm[top][m] for m in dm[top] if m not in summary["members"]]
    assert not dropped or min(kept_costs) >= max(dropped)
    # the final headline line is the last line and parses
    last = json.loads(captured.splitlines()[-1])
    assert last["metric"] == "headline_queries_total"


def test_digest_members_lines_ascend_by_cost():
    """Nearest-to-final-line wins survival, so the heaviest digest's
    full member pricing must print LAST among digest_members lines."""
    timings, mins, dm, final_rec = _realistic_inputs()
    lines = bench._tail_lines(timings, mins, dm, final_rec)
    groups = [
        json.loads(line)["digest"]
        for line in lines
        if line.startswith('{"metric":"digest_members"')
    ]
    costs = [timings[g] for g in groups]
    assert costs == sorted(costs)


def test_floor_keys_round_trip_through_miner():
    """The compact floors keys must expand back to the exact registry
    names next round — _prior_round_floors and _tail_lines share the
    _floor_keys mapping, pinned here end-to-end through a fake artifact."""
    timings, mins, dm, final_rec = _realistic_inputs()
    lines = bench._tail_lines(timings, mins, dm, final_rec)
    digest_rows = {
        n for n in timings if n.endswith("_digest") or n == "pipeline_build"
    }
    art = {"tail": "\n".join(lines[-2:]), "parsed": None}
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "BENCH_r98.json")
        with open(path, "w") as f:
            json.dump(art, f)
        # point the miner at the temp dir by monkeypatching its glob base
        real_abspath = os.path.abspath

        def fake_abspath(p):
            return os.path.join(d, "bench.py") if p.endswith("bench.py") else real_abspath(p)

        os.path.abspath, saved = fake_abspath, os.path.abspath
        try:
            floors = bench._prior_round_floors(set(timings))
        finally:
            os.path.abspath = saved
    # every digest row's floor came back under its FULL registry name
    for n in digest_rows:
        assert n in floors, n
        assert floors[n] == pytest.approx(round(mins[n], 1), abs=0.051)


def test_floor_keys_collisions_keep_full_names():
    m = bench._floor_keys(["jaffle_tests_digest", "tests_digest", "acid_digest"])
    assert m["acid_digest"] == "acid"
    assert m["jaffle_tests_digest"] == "jaffle_tests_digest"
    assert m["tests_digest"] == "tests_digest"


def test_contended_flag_rules():
    """r12 verdict item 4: launch load above threshold OR retries firing
    on more than a third of rows declare the artifact contended; healthy
    runs (quiet launch, few retries) must NOT flag — per-row raw load
    cannot be the signal (healthy self-load is 8-19, BASELINE r4/r6)."""
    assert not bench._contended(0.3, 0, 51)
    assert not bench._contended(3.9, 17, 51)  # exactly 1/3 — not over
    assert bench._contended(12.0, 0, 51)  # loaded launch
    assert bench._contended(0.3, 18, 51)  # >1/3 rows re-timed
    assert bench._contended(4.1, 0, 51)
    assert not bench._contended(0.0, 0, 0)  # degenerate


def test_budget_blown_degrades_to_warning_record_not_crash():
    """A production bench run must never crash away the whole artifact:
    when even the trimmed pair exceeds the budget, a visible
    tail_budget_blown record is emitted and both lines still print."""
    timings = {f"q{i:02d}_very_long_synthetic_name_padding": 10.0 for i in range(200)}
    timings["x_digest"] = 50.0
    mins = dict(timings)
    final_rec = {"metric": "headline_queries_total", "queries": timings}
    lines = bench._tail_lines(timings, mins, {}, final_rec)
    assert any(l.startswith('{"metric":"tail_budget_blown"') for l in lines)
    assert json.loads(lines[-1])["metric"] == "headline_queries_total"
    with pytest.raises(AssertionError):
        bench._tail_lines(timings, mins, {}, final_rec, strict=True)
