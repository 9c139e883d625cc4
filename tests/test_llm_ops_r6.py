"""Round-6 operator tests: the streaming sessionizer's crash-restart
parity (twin of test_streaming_attribution_restart_no_duplicate_pairs)."""

from __future__ import annotations


def test_streaming_sessionize_restart_resumes_user_state(
    spark, oracle, sf_dir, tmp_path
):
    """Crash-restart for the custom applyInPandasWithState sessionizer:
    run phase 1 over the early half of the events feed with a durable
    checkpoint, then add the late half and RE-RUN with the same
    checkpoint. The restart must resume source offsets AND each user's
    open-session state — no emission committed twice, per-user
    session_idx numbering continues across the boundary (a lost state
    store would restart it at 1 and corrupt keys), at least one
    boundary-straddling session merges (final n_events greater than its
    phase-1 partial), and the compacted final equals the batch operator
    over the full feed (the DuckDB oracle, verbatim)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from dbt_jaffleshop_spark.streaming import sessionize
    from tests.conftest import assert_parity

    from dbt_jaffleshop_spark.llm.events import SESSION_GAP_US

    t = pq.read_table(f"{sf_dir}/events.parquet")
    ts_us = pc.cast(t["ts"], "int64")
    # cut INSIDE a session: the first same-user consecutive event pair
    # within the gap (sorted by user, ts) guarantees a straddler — a
    # median-time cut does not at this sf
    pdf = (
        t.select(["user_id", "ts"])
        .to_pandas()
        .assign(ts_us=ts_us.to_pylist())
        .sort_values(["user_id", "ts_us"])
    )
    same_user = pdf["user_id"].eq(pdf["user_id"].shift(-1))
    dt = pdf["ts_us"].shift(-1) - pdf["ts_us"]
    inside = pdf["ts_us"][same_user & (dt > 0) & (dt <= SESSION_GAP_US)]
    assert len(inside), "no multi-event session in the fixture"
    cut = int(inside.iloc[0])
    feed = tmp_path / "feed"
    feed.mkdir()
    early = t.filter(pc.less_equal(ts_us, cut))
    late = t.filter(pc.greater(ts_us, cut))
    assert early.num_rows and late.num_rows
    pq.write_table(early, feed / "events-0.parquet")

    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    phase1 = sessionize.streaming_sessionize(
        spark, str(feed), checkpoint_dir=ckpt, output_dir=out
    )
    p1 = {(r.user_id, r.session_idx): r.n_events for r in phase1.collect()}
    assert p1

    pq.write_table(late, feed / "events-1.parquet")
    final = sessionize.streaming_sessionize(
        spark, str(feed), checkpoint_dir=ckpt, output_dir=out
    )

    # the RAW replay log: restart must not have re-committed phase-1
    # emissions (availableNow + checkpointed parquet sink = exactly-once
    # file commits), so no full row may appear twice
    raw = spark.read.parquet(out)
    assert raw.count() == raw.distinct().count(), "restart re-emitted rows"

    fin = {(r.user_id, r.session_idx): r.n_events for r in final.collect()}
    # every phase-1 session key survives with >= its partial extent
    assert set(p1) <= set(fin)
    assert all(fin[k] >= n for k, n in p1.items())
    # state genuinely resumed: some open session straddled the cut and
    # grew after the restart (the time split guarantees straddlers at
    # this sf; if it ever stops producing one, the split is degenerate
    # and the test should fail loudly rather than pass vacuously)
    assert any(fin[k] > n for k, n in p1.items()), (
        "no session merged across the restart boundary"
    )
    # and the compacted final is the batch result, bit-for-bit
    assert_parity(final, oracle, sessionize.ORACLES["streaming_sessionize"])
