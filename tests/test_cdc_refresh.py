"""CDC-driven aggregate-view maintenance (r11b, plans/cdc_refresh.py):
the view must track ANY upstream commit sequence exactly (≡ full
recompute), touch only the buckets holding changed keys, skip
rewritten-unchanged data entirely, and refuse to double-fold or
silently skip a vacuumed range."""

import os

import pytest
from pyspark.sql import functions as F

from dbt_jaffleshop_spark.plans.acid import AcidTable
from dbt_jaffleshop_spark.plans.cdc_refresh import (
    _agg,
    build_agg_view,
    refresh_agg_view,
)
from dbt_jaffleshop_spark.sources import load_table


def _upstream_frame(spark, sf_dir, lo=0, hi=200):
    return (
        load_table(spark, "orders", sf_dir)
        .select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_orderkey") % 97).cast("bigint").alias("val"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .where((F.col("o_orderkey") % 1000 >= lo) & (F.col("o_orderkey") % 1000 < hi))
    )


def _mk(spark, sf_dir, tmp_path):
    up = AcidTable(os.path.join(str(tmp_path), "up"))
    view = AcidTable(os.path.join(str(tmp_path), "view"))
    up.append(_upstream_frame(spark, sf_dir), partition_by=["month"])
    build_agg_view(spark, up, view, key="o_custkey", val="val", n_buckets=8)
    return up, view


def _content(df):
    return sorted(map(tuple, df.select("o_custkey", "cnt", "total").collect()))


def _expect(spark, up):
    return _content(_agg(up.read(spark), "o_custkey", "val"))


def test_view_tracks_append_replace_and_delete_exactly(spark, sf_dir, tmp_path):
    up, view = _mk(spark, sf_dir, tmp_path)
    assert _content(view.read(spark)) == _expect(spark, up)

    # append a disjoint slice
    up.append(_upstream_frame(spark, sf_dir, 200, 320))
    # replace one month: keep only even orderkeys, double their val
    month = up.read(spark).select("month").orderBy("month").first()[0]
    repl = (
        up.read(spark)
        .where((F.col("month") == month) & (F.col("o_orderkey") % 2 == 0))
        .withColumn("val", (F.col("val") * 2).cast("bigint"))
    )
    up.overwrite_partitions(repl, "month", [month])

    refresh_agg_view(spark, up, view)
    assert _content(view.read(spark)) == _expect(spark, up)
    assert int(view.manifest()["meta"]["upstream_version"]) == up.current_version()

    # replayed refresh: nothing to fold, no new commit
    v = view.current_version()
    refresh_agg_view(spark, up, view)
    assert view.current_version() == v

    # a key deleted entirely leaves the view
    victim = up.read(spark).select("o_custkey").first()[0]
    for m in [r[0] for r in up.read(spark).where(
        F.col("o_custkey") == victim
    ).select("month").distinct().collect()]:
        kept = up.read(spark).where(
            (F.col("month") == m) & (F.col("o_custkey") != victim)
        )
        up.overwrite_partitions(kept, "month", [m])
    refresh_agg_view(spark, up, view)
    assert _content(view.read(spark)) == _expect(spark, up)
    assert (
        view.read(spark).where(F.col("o_custkey") == victim).count() == 0
    )


def test_refresh_rewrites_only_affected_buckets(spark, sf_dir, tmp_path):
    up, view = _mk(spark, sf_dir, tmp_path)
    pre = view.manifest()

    # one new row -> one key -> exactly one view bucket
    one = up.read(spark).limit(1).select(
        (F.col("o_orderkey") + 10**9).alias("o_orderkey"),
        (F.col("o_custkey") + 10**9).alias("o_custkey"),
        F.lit(7).cast("bigint").alias("val"),
        F.col("month"),
    )
    up.append(one)
    refresh_agg_view(spark, up, view)

    post = view.manifest()
    by_part = lambda m: {  # noqa: E731
        d: sorted(f for f in m["files"] if f.split("/", 1)[0] == d)
        for d in {f.split("/", 1)[0] for f in m["files"]}
    }
    pre_p, post_p = by_part(pre), by_part(post)
    changed = [d for d in post_p if post_p[d] != pre_p.get(d)]
    assert len(changed) == 1, changed
    assert _content(view.read(spark)) == _expect(spark, up)


def test_rewrite_without_change_touches_zero_buckets(spark, sf_dir, tmp_path):
    up, view = _mk(spark, sf_dir, tmp_path)
    pre_files = view.manifest()["files"]

    # full upstream rewrite with IDENTICAL content: every row shows up as
    # delete+insert in the feed, every per-key delta nets to zero
    up.overwrite(up.read(spark), partition_by=["month"])
    refresh_agg_view(spark, up, view)

    m = view.manifest()
    assert m["files"] == pre_files  # zero partitions rewritten
    assert int(m["meta"]["upstream_version"]) == up.current_version()
    assert _content(view.read(spark)) == _expect(spark, up)


def test_concurrent_refresh_loses_the_commit_race(spark, sf_dir, tmp_path):
    from dbt_jaffleshop_spark.plans.cdc_refresh import _resume_guard

    up, view = _mk(spark, sf_dir, tmp_path)
    stale = int(view.manifest()["meta"]["upstream_version"])
    up.append(_upstream_frame(spark, sf_dir, 200, 250))
    refresh_agg_view(spark, up, view)  # the winner

    # the loser staged against the OLD resume point; its commit-time
    # guard must refuse rather than double-fold the range
    with pytest.raises(ValueError, match="concurrent refresh"):
        view.overwrite_partitions(
            view.read(spark).limit(0),
            "kb",
            [],
            validate=_resume_guard(view.path, stale - 1),
        )


def test_vacuumed_range_fails_loudly_then_rebuild_recovers(
    spark, sf_dir, tmp_path
):
    up, view = _mk(spark, sf_dir, tmp_path)
    for lo in (200, 260, 320, 380):
        up.append(_upstream_frame(spark, sf_dir, lo, lo + 60))
    up.vacuum(keep_last=2, orphan_grace_s=0.0)
    with pytest.raises(ValueError, match="vacuumed"):
        refresh_agg_view(spark, up, view)
    build_agg_view(spark, up, view, key="o_custkey", val="val", n_buckets=8)
    assert _content(view.read(spark)) == _expect(spark, up)


def test_streaming_upstream_feeds_cdc_view(spark, sf_dir, tmp_path):
    """Subsystem composition: micro-batches land in the upstream through
    the streaming ACID sink (per-batch atomic appends), and the CDC view
    refresh folds exactly the landed commits — the continuous form of
    view maintenance. Late-arriving files restart the stream, append
    more commits, and one refresh catches the view up to a full
    recompute."""
    import pyarrow.parquet as pq

    from dbt_jaffleshop_spark.streaming.sink import streaming_events_to_acid

    t = pq.read_table(f"{sf_dir}/events.parquet")
    src = tmp_path / "feed"
    src.mkdir()
    third = t.num_rows // 3
    pq.write_table(t.slice(0, third), src / "part-0.parquet")

    up = streaming_events_to_acid(
        spark, str(src), str(tmp_path / "up"), max_files_per_trigger=1
    )
    view = AcidTable(os.path.join(str(tmp_path), "view"))
    build_agg_view(spark, up, view, key="user_id", val="value", n_buckets=8)

    # late files arrive; the stream restarts from its checkpoint and
    # appends only the new batches
    pq.write_table(t.slice(third, third), src / "part-1.parquet")
    pq.write_table(t.slice(2 * third), src / "part-2.parquet")
    streaming_events_to_acid(
        spark, str(src), str(tmp_path / "up"), max_files_per_trigger=1
    )

    refresh_agg_view(spark, up, view)
    got = sorted(map(tuple, view.read(spark).select("user_id", "cnt", "total").collect()))
    want = sorted(map(tuple, _agg(up.read(spark), "user_id", "value").collect()))
    assert got == want
    assert int(view.manifest()["meta"]["upstream_version"]) == up.current_version()


def test_build_pins_the_recorded_upstream_version(spark, sf_dir, tmp_path):
    """A commit landing between build_agg_view's version resolution and
    its snapshot read must NOT leak into the built view (it would be
    double-folded by the next refresh): the build reads exactly the
    version it records as the resume point."""
    up = AcidTable(os.path.join(str(tmp_path), "up"))
    view = AcidTable(os.path.join(str(tmp_path), "view"))
    up.append(_upstream_frame(spark, sf_dir), partition_by=["month"])
    v0 = up.current_version()

    real_cv = up.current_version

    def stale_then_commit():
        # resolve v0, then a racer lands BEFORE the snapshot read
        up.current_version = real_cv
        up.append(_upstream_frame(spark, sf_dir, 200, 260))
        return v0

    up.current_version = stale_then_commit
    build_agg_view(spark, up, view, key="o_custkey", val="val", n_buckets=8)

    # the view holds exactly v0's aggregate, not the racer's rows
    assert _content(view.read(spark)) == _content(
        _agg(up.read(spark, version=v0), "o_custkey", "val")
    )
    assert int(view.manifest()["meta"]["upstream_version"]) == v0
    # and ONE refresh folds the racer's commit exactly once
    refresh_agg_view(spark, up, view)
    assert _content(view.read(spark)) == _expect(spark, up)
