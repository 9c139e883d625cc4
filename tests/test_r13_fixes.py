"""Fails-before regression pins for the round-13 ADVICE findings.

1. plans/acid.py append_from / pinned replace_partitions_and_append:
   in the retry-merge of carried-file stats, attempt_meta's entries won
   over ``carried`` — but attempt_meta holds the PINNED base snapshot's
   stats, collected under a PREVIOUS stats_columns declaration. A
   concurrent set_stats_columns that RE-declared a different column set
   and backfilled fresh entries for the base files was overridden by the
   stale pre-redeclaration entries: the committed manifest declared the
   new stats_columns while base files carried min/max for the old ones,
   degrading file skipping for them (the narrower cousin of the r12
   coverage bug). Fix: carried (live) wins for base/kept files — safe
   because carried is filtered to base names, which never collide with
   freshly staged uuid names.
2. bench._prior_round_floors: the expand map was computed per-round over
   the CURRENT name set; a short floors key recorded pre-collision was
   silently dropped once the registry added a colliding digest (both now
   map to full names). Fix: the miner additionally indexes each known
   digest's unconditionally-shortened form, sorted first-writer wins.
3. scripts/paired_ab.py: each tree×query child had no timeout — a
   wedged child Spark session (the exact contended conditions the
   script adjudicates) hung the whole A/B. Fix: --timeout (default
   600 s) converts TimeoutExpired into a per-measurement error row.
"""

from __future__ import annotations

import importlib.util
import json
import os
import subprocess
import sys

from dbt_jaffleshop_spark.plans.acid import AcidTable

_HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script(name: str, rel: str):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(_HERE, rel)
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _race_set_stats(table: AcidTable, cols):
    """Arm the table so its NEXT commit attempt loses to a concurrent
    set_stats_columns re-declaration and retries (test_r12_fixes)."""
    racer = AcidTable(table.path)
    real_commit = table._commit
    fired = []

    def racing_commit(files, partition_by, meta=None, expected_parent=None):
        if not fired:
            fired.append(1)
            racer.set_stats_columns(list(cols))
        return real_commit(files, partition_by, meta, expected_parent)

    table._commit = racing_commit
    return fired


# ------------- 1. live backfill wins over pinned stale stats entries


def test_append_from_live_backfill_wins_on_redeclared_columns(
    spark, tmp_path
):
    """Base files already carried stats for the OLD declaration ["id"];
    a concurrent set_stats_columns(["v"]) re-declares and backfills.
    The committed manifest declares ["v"], so base files must carry the
    LIVE "v" entries, not the stale pinned "id"-only ones."""
    t = AcidTable(str(tmp_path / "t"))
    t.append(
        spark.createDataFrame(
            [(i, i * 2) for i in range(100)], "id bigint, v bigint"
        )
    )
    t.set_stats_columns(["id"])  # base files now carry {"id": [lo, hi]}
    base_v = t.current_version()
    base_files = set(t.manifest(base_v)["files"])
    for f in base_files:
        assert "id" in t.manifest(base_v)["meta"]["stats"][f]

    fired = _race_set_stats(t, ["v"])
    ver = t.append_from(
        spark.createDataFrame([(500, 9)], "id bigint, v bigint"),
        base_version=base_v,
    )
    assert fired
    m = t.manifest(ver)
    assert m["meta"]["stats_columns"] == ["v"]
    assert set(m["meta"]["stats"]) == set(m["files"])
    # every BASE file's entry matches the committed declaration (live
    # backfill), not the pinned pre-redeclaration column set
    for f in base_files:
        assert "v" in m["meta"]["stats"][f], f
    # this commit's own staged files keep their freshly collected
    # entries (an empty staged part-file legitimately has {} — no row
    # groups, no stats); none may carry the stale "id"-only declaration
    staged = set(m["files"]) - base_files
    assert any("v" in m["meta"]["stats"][f] for f in staged)
    for f in staged:
        assert "id" not in m["meta"]["stats"][f], f


def test_pinned_replace_live_backfill_wins_on_redeclared_columns(
    spark, tmp_path
):
    """Same reopened race for the pinned partition-replace path: kept
    files' stats come from the LIVE backfill under the re-declared
    column set."""
    t = AcidTable(str(tmp_path / "p"))
    t.append(
        spark.createDataFrame(
            [(i, i * 3, i % 3) for i in range(90)],
            "id bigint, v bigint, part int",
        ),
        partition_by=["part"],
    )
    t.set_stats_columns(["id"])
    base_v = t.current_version()

    fired = _race_set_stats(t, ["v"])
    ver = t.overwrite_partitions(
        spark.createDataFrame(
            [(1000, 7, 0)], "id bigint, v bigint, part int"
        ),
        "part",
        [0],
        base_version=base_v,
    )
    assert fired
    m = t.manifest(ver)
    assert m["meta"]["stats_columns"] == ["v"]
    assert set(m["meta"]["stats"]) == set(m["files"])
    kept = [f for f in m["files"] if "part=0" not in f.split(os.sep)]
    assert kept
    for f in kept:
        assert "v" in m["meta"]["stats"][f], f


# ---------------- 2. pre-collision short floors key still resolves


def test_prior_floors_expand_precollision_short_key(tmp_path, monkeypatch):
    bench = _load_script("bench_r13fix", "bench.py")
    # prior artifact recorded "tests": no collision THEN; the current
    # registry has BOTH colliding digests, so _floor_keys maps each to
    # its full name and the plain expand map has no "tests" entry
    art = {
        "tail": json.dumps(
            {"metric": "tail_summary", "floors": {"tests": 7.3, "acid": 40.8}}
        ),
        "parsed": None,
    }
    with open(tmp_path / "BENCH_r97.json", "w") as f:
        json.dump(art, f)
    real_abspath = os.path.abspath
    monkeypatch.setattr(
        os.path,
        "abspath",
        lambda p: str(tmp_path / "bench.py")
        if p.endswith("bench.py")
        else real_abspath(p),
    )
    known = {"jaffle_tests_digest", "tests_digest", "acid_digest"}
    floors = bench._prior_round_floors(known)
    # non-colliding key expands exactly; the pre-collision short key
    # resolves to the sorted-first colliding twin instead of dropping
    assert floors.get("acid_digest") == 40.8
    assert floors.get("jaffle_tests_digest") == 7.3
    assert "tests" not in floors  # resolved, not passed through raw


# --------------------- 3. paired_ab child timeout becomes an error row


def test_paired_ab_timeout_becomes_error_row(monkeypatch, capsys):
    ab = _load_script("paired_ab_r13fix", "scripts/paired_ab.py")

    calls = []

    def fake_run(cmd, capture_output, text, timeout):
        calls.append(timeout)
        raise subprocess.TimeoutExpired(cmd, timeout, output="partial out")

    monkeypatch.setattr(ab.subprocess, "run", fake_run)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "paired_ab.py",
            "--trees", "/tmp/a", "/tmp/b",
            "--queries", "acid_digest",
            "--passes", "1",
            "--runs", "1",
            "--timeout", "5",
        ],
    )
    ab.main()  # must NOT hang or raise
    out = capsys.readouterr().out.strip().splitlines()
    errs = [json.loads(l) for l in out if "error" in l]
    # one error row per tree×query measurement, timeout propagated
    assert len(errs) == 2
    assert all("timeout after 5" in e["error"] for e in errs)
    assert calls == [5.0, 5.0]
    # the summary line still prints (remaining passes/trees survive)
    assert json.loads(out[-1])["metric"] == "paired_ab"
