"""Write-time CHECK constraints on AcidTable (r11b): declared once
against a clean snapshot, enforced on every subsequent write path, and
sticky across appends, pinned-base appends, partition replaces, full
overwrites, and compaction — the write-side quality gate beside the
declarative tests and the WAP audit."""

import os

import pytest

from dbt_jaffleshop_spark.plans.acid import AcidTable


def _t(spark, tmp_path, partitioned=False):
    t = AcidTable(os.path.join(str(tmp_path), "tbl"))
    if partitioned:
        t.append(
            spark.createDataFrame(
                [(1, 10, 0), (2, 20, 1)], "id bigint, amount bigint, p int"
            ),
            partition_by=["p"],
        )
    else:
        t.append(
            spark.createDataFrame([(1, 10), (2, 20)], "id bigint, amount bigint")
        )
    return t


def test_add_constraint_scans_existing_rows(spark, tmp_path):
    t = _t(spark, tmp_path)
    with pytest.raises(ValueError, match="violated by existing rows"):
        t.add_constraint(spark, "big_amount", "amount > 15")
    t.add_constraint(spark, "positive_amount", "amount > 0")
    assert t.constraints() == {"positive_amount": "amount > 0"}


def test_writes_refuse_violating_rows_on_every_path(spark, tmp_path):
    t = _t(spark, tmp_path, partitioned=True)
    t.add_constraint(spark, "positive_amount", "amount > 0")

    bad = spark.createDataFrame(
        [(3, -1, 0)], "id bigint, amount bigint, p int"
    )
    ok = spark.createDataFrame(
        [(3, 30, 0)], "id bigint, amount bigint, p int"
    )
    with pytest.raises(ValueError, match="positive_amount"):
        t.append(bad)
    with pytest.raises(ValueError, match="positive_amount"):
        t.append_from(bad, t.current_version())
    with pytest.raises(ValueError, match="positive_amount"):
        t.overwrite_partitions(bad, "p", [0])
    with pytest.raises(ValueError, match="positive_amount"):
        t.overwrite(bad, partition_by=["p"])
    # null is a violation, like SQL CHECK
    with pytest.raises(ValueError, match="positive_amount"):
        t.append(
            spark.createDataFrame([(4, None, 1)], "id bigint, amount bigint, p int")
        )
    t.append(ok)
    assert t.read(spark).count() == 3


def test_constraints_are_sticky_across_every_commit_flavor(spark, tmp_path):
    t = _t(spark, tmp_path, partitioned=True)
    t.add_constraint(spark, "positive_amount", "amount > 0")
    ok = lambda i, p: spark.createDataFrame(  # noqa: E731
        [(i, i * 10, p)], "id bigint, amount bigint, p int"
    )
    t.append(ok(3, 0))
    t.append_from(ok(4, 1), t.current_version())
    t.overwrite_partitions(ok(5, 1), "p", [1])
    t.compact(spark)
    t.overwrite(t.read(spark), partition_by=["p"])
    assert t.constraints() == {"positive_amount": "amount > 0"}
    with pytest.raises(ValueError, match="positive_amount"):
        t.append(
            spark.createDataFrame([(9, 0, 0)], "id bigint, amount bigint, p int")
        )


def test_drop_constraint_reopens_the_gate(spark, tmp_path):
    t = _t(spark, tmp_path)
    t.add_constraint(spark, "positive_amount", "amount > 0")
    t.drop_constraint("positive_amount")
    assert t.constraints() == {}
    t.append(spark.createDataFrame([(3, -5)], "id bigint, amount bigint"))
    with pytest.raises(ValueError, match="no constraint named"):
        t.drop_constraint("positive_amount")


def test_constraint_on_evolved_column_guards_null_fill(spark, tmp_path):
    """A not-null-style CHECK on a merge_schema-added column refuses the
    null fill an omitting write would produce — evolution and
    constraints compose rather than bypass each other."""
    t = _t(spark, tmp_path)
    t.append(
        spark.createDataFrame(
            [(3, 30, 7)], "id bigint, amount bigint, score int"
        ),
        merge_schema=True,
    )
    # existing pre-evolution rows have score null -> constraint refused
    with pytest.raises(ValueError, match="violated by existing rows"):
        t.add_constraint(spark, "score_set", "score IS NOT NULL")
    t.add_constraint(spark, "score_bound", "score IS NULL OR score < 100")
    with pytest.raises(ValueError, match="score_bound"):
        t.append(
            spark.createDataFrame(
                [(4, 40, 120)], "id bigint, amount bigint, score int"
            )
        )


def test_concurrent_add_constraint_is_enforced_by_inflight_write(
    spark, tmp_path
):
    """The commit-time recheck: a constraint that lands AFTER a writer's
    pre-stage validation but BEFORE its commit must still gate that
    writer's rows (and survive in the committed meta) — staged state
    alone can neither drop nor bypass it."""
    t = _t(spark, tmp_path)
    racer = AcidTable(t.path)

    real_stage = t._stage

    def staging_race(df, partition_by, **kw):
        out = real_stage(df, partition_by, **kw)
        if not racer.constraints():  # fire once
            racer.add_constraint(spark, "positive_amount", "amount > 0")
        return out

    t._stage = staging_race
    with pytest.raises(ValueError, match="positive_amount"):
        t.append(
            spark.createDataFrame([(3, -1)], "id bigint, amount bigint")
        )
    # a clean write in the same raced situation commits AND carries the
    # racer's constraint forward
    t.append(spark.createDataFrame([(4, 40)], "id bigint, amount bigint"))
    assert t.constraints() == {"positive_amount": "amount > 0"}

    # same recheck on the full-overwrite path
    t2 = _t(spark, tmp_path / "b")
    racer2 = AcidTable(t2.path)
    real_stage2 = t2._stage

    def staging_race2(df, partition_by, **kw):
        out = real_stage2(df, partition_by, **kw)
        if not racer2.constraints():
            racer2.add_constraint(spark, "positive_amount", "amount > 0")
        return out

    t2._stage = staging_race2
    with pytest.raises(ValueError, match="positive_amount"):
        t2.overwrite(
            spark.createDataFrame([(9, -9)], "id bigint, amount bigint")
        )


def test_add_constraint_loses_race_against_inflight_append(spark, tmp_path):
    """TOCTOU guard: a VIOLATING row committed between add_constraint's
    validation scan and its commit can never activate the constraint.
    r13 semantics: the lost parent check retries and the retry
    re-validates against the winner's manifest — so the refusal is the
    actionable ValueError naming the constraint, not a raw
    CommitConflictError surfaced to the caller."""
    t = _t(spark, tmp_path)
    racer = AcidTable(t.path)
    real_check = t._violations_or_raise
    fired = []

    def racing_check(df, cons, what):
        if what == "existing rows" and not fired:
            fired.append(1)
            racer.append(
                spark.createDataFrame([(99, -99)], "id bigint, amount bigint")
            )
        return real_check(df, cons, what)

    t._violations_or_raise = racing_check
    with pytest.raises(ValueError, match="violated by existing rows"):
        t.add_constraint(spark, "positive_amount", "amount > 0")
    assert fired
    assert t.constraints() == {}  # never activated


def test_multi_constraint_violation_names_the_broken_one(spark, tmp_path):
    """All constraints evaluate in ONE scan (r11 ADVICE: N constraints
    used to cost N scans per write) and the refusal still names exactly
    the constraint the row breaks."""
    t = _t(spark, tmp_path)
    t.add_constraint(spark, "positive_amount", "amount > 0")
    t.add_constraint(spark, "small_id", "id < 100")
    with pytest.raises(ValueError, match="small_id"):
        t.append(
            spark.createDataFrame([(500, 10)], "id bigint, amount bigint")
        )
    with pytest.raises(ValueError, match="positive_amount"):
        t.append(
            spark.createDataFrame([(3, -1)], "id bigint, amount bigint")
        )


def test_violating_write_discards_its_staged_files(spark, tmp_path):
    """Enforcement runs on the STAGED files (the commit's actual bytes,
    closing the validate-vs-stage double-evaluation gap for
    nondeterministic sources — r11 ADVICE) and a refused write leaves no
    orphaned data files behind."""
    t = _t(spark, tmp_path, partitioned=True)
    t.add_constraint(spark, "positive_amount", "amount > 0")

    def _data_files():
        out = []
        for root, _dirs, fs in os.walk(t.data_dir):
            out.extend(os.path.join(root, f) for f in fs if f.endswith(".parquet"))
        return sorted(out)

    before = _data_files()
    bad = spark.createDataFrame([(3, -1, 0)], "id bigint, amount bigint, p int")
    for attempt in (
        lambda: t.append(bad),
        lambda: t.overwrite(bad, partition_by=["p"]),
        lambda: t.append_from(bad, t.current_version()),
        lambda: t.overwrite_partitions(bad, "p", [0]),
    ):
        with pytest.raises(ValueError, match="positive_amount"):
            attempt()
        assert _data_files() == before


def test_concurrent_add_constraint_gates_pinned_append(spark, tmp_path):
    """r12 review: append_from pins FILE carry-forward to its base but
    parents on the live manifest — a constraint added after its
    pre-stage read must gate the staged rows and survive in the
    committed meta (the sibling writers' recheck, now on the pinned
    path too)."""
    t = _t(spark, tmp_path)
    racer = AcidTable(t.path)
    real_stage = t._stage

    def staging_race(df, partition_by, **kw):
        out = real_stage(df, partition_by, **kw)
        if not racer.constraints():
            racer.add_constraint(spark, "positive_amount", "amount > 0")
        return out

    t._stage = staging_race
    base_v = t.current_version()
    with pytest.raises(ValueError, match="positive_amount"):
        t.append_from(
            spark.createDataFrame([(3, -1)], "id bigint, amount bigint"),
            base_v,
        )
    # a clean pinned append in the same raced situation commits AND
    # carries the racer's constraint forward
    t.append_from(
        spark.createDataFrame([(4, 40)], "id bigint, amount bigint"), base_v
    )
    assert t.constraints() == {"positive_amount": "amount > 0"}


def test_pinned_append_does_not_resurrect_dropped_constraint(
    spark, tmp_path
):
    """The flip side: a drop_constraint landing between the pinned
    base and the commit must not be resurrected by recommitting the
    base's constraint set — the LIVE set is authoritative."""
    t = _t(spark, tmp_path)
    t.add_constraint(spark, "positive_amount", "amount > 0")
    base_v = t.current_version()
    t.drop_constraint("positive_amount")
    t.append_from(
        spark.createDataFrame([(5, -50)], "id bigint, amount bigint"),
        base_v,
    )
    assert t.constraints() == {}
