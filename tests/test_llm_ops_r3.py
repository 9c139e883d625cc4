"""Behavioral tests for the round-3 LLM-pipeline operators (pii scrub,
repetition quality, chunking, stratified sampling, duplicate clusters,
funnel). Oracle parity is covered by test_llm_ops.py's parametrized
sweep; these pin the semantics on constructed corpora."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def docs_dir(tmp_path):
    def write(rows):
        pd.DataFrame(
            [
                {"doc_id": i, "text": t, "lang": lang, "source": "t",
                 "n_chars": len(t)}
                for i, (t, lang) in enumerate(rows)
            ]
        ).to_parquet(tmp_path / "documents.parquet")
        return str(tmp_path)

    return write


def test_pii_scrub_redacts_every_injected_pattern(spark, docs_dir):
    from dbt_jaffleshop_spark.llm.text import text_pii_scrub

    sf = docs_dir([("plain text no pii", "en"), ("another doc", "en")])
    rows = {r.doc_id: r for r in text_pii_scrub(spark, sf).collect()}
    # the deterministic injected suffix carries exactly one of each kind
    assert all(r.n_emails == 1 and r.n_ipv4 == 1 and r.n_phones == 1
               for r in rows.values())
    # and scrubbing actually replaced them: re-scan of the scrubbed text
    # (reconstructed here) must find zero matches — covered by parity with
    # the oracle; spot-check the scrub is not identity via length change
    assert all(r.scrubbed_chars > 0 for r in rows.values())


def test_repetition_flags_degenerate_doc_only(spark, docs_dir):
    from dbt_jaffleshop_spark.llm.text import text_repetition

    loop = "buy now " * 30          # one 2-gram dominates
    varied = " ".join(f"w{i}" for i in range(60))
    sf = docs_dir([(loop.strip(), "en"), (varied, "en")])
    rows = {r.doc_id: r for r in text_repetition(spark, sf).collect()}
    assert rows[0].is_repetitive and rows[0].top_2gram_frac > 0.4
    assert not rows[1].is_repetitive and rows[1].dup_3gram_frac == 0.0


def test_doc_chunk_covers_text_with_expected_overlap(spark, docs_dir):
    from dbt_jaffleshop_spark.llm.text import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
        doc_chunk,
    )

    n = 200
    sf = docs_dir([(" ".join(f"t{i}" for i in range(n)), "en"),
                   ("short doc", "en")])
    rows = doc_chunk(spark, sf).collect()
    long_chunks = sorted(
        (r for r in rows if r.doc_id == 0), key=lambda r: r.chunk_idx
    )
    # expected chunk count: 1 + ceil((200-64)/48) = 4
    assert len(long_chunks) == 4
    assert [c.start_token for c in long_chunks] == [
        1 + i * CHUNK_STRIDE for i in range(4)
    ]
    # full coverage: last chunk reaches the end of the doc
    last = long_chunks[-1]
    assert last.start_token + last.chunk_n_tokens - 1 == n
    assert all(c.chunk_n_tokens <= CHUNK_TOKENS for c in long_chunks)
    short = [r for r in rows if r.doc_id == 1]
    assert len(short) == 1 and short[0].chunk_n_tokens == 2


def test_stratified_sample_rates_and_determinism(spark, sf_dir):
    from dbt_jaffleshop_spark.llm.corpus import (
        SAMPLE_RATES_BP,
        corpus_sample_stratified,
    )

    a = corpus_sample_stratified(spark, sf_dir).toPandas()
    b = corpus_sample_stratified(spark, sf_dir).toPandas()
    # deterministic: byte-identical across invocations
    pd.testing.assert_frame_equal(
        a.sort_values("doc_id").reset_index(drop=True),
        b.sort_values("doc_id").reset_index(drop=True),
    )
    # full-rate strata keep everything; zero-rate impossible here
    assert (a["sample_bucket"] < a["stratum_rate_bp"]).all()
    assert set(a["stratum_rate_bp"]) <= set(SAMPLE_RATES_BP.values())


def test_dedup_clusters_transitive_closure(spark, docs_dir):
    """A~B and B~C near-dups (A and C farther apart) must land in ONE
    cluster keyed by the min doc_id — the transitivity the pairwise
    operators cannot express."""
    from dbt_jaffleshop_spark.llm.dedup import dedup_clusters

    base = [f"w{i}" for i in range(40)]
    a = " ".join(base)
    b = " ".join(base[:36] + ["x1", "x2", "x3", "x4"])
    c = " ".join(base[:32] + ["x1", "x2", "x3", "x4", "y1", "y2", "y3", "y4"])
    other = " ".join(f"z{i}" for i in range(40))
    sf = docs_dir([(a, "en"), (b, "en"), (c, "en"), (other, "en")])
    rows = {r.doc_id: r for r in dedup_clusters(spark, sf).collect()}
    assert set(rows) >= {0, 1, 2}
    assert rows[0].cluster_id == rows[1].cluster_id == rows[2].cluster_id == 0
    assert rows[0].cluster_size == 3
    assert 3 not in rows  # the unrelated doc joins no cluster


def test_funnel_respects_stage_order_and_window(spark, tmp_path):
    from dbt_jaffleshop_spark.llm.events import events_funnel

    day_us = 24 * 3600 * 1_000_000
    t0 = pd.Timestamp("2024-01-01")

    def ev(eid, uid, etype, day_offset):
        return {"event_id": eid, "ts": t0 + pd.Timedelta(days=day_offset),
                "user_id": uid, "event_type": etype, "value": 1.0,
                "props": "{}"}

    rows = [
        # u1: full funnel in order
        ev(1, 1, "view", 0), ev(2, 1, "click", 1), ev(3, 1, "purchase", 2),
        # u2: click BEFORE view → click doesn't count; no purchase window
        ev(4, 2, "click", 0), ev(5, 2, "view", 1),
        # u3: click 10 days after view → outside the 7-day window
        ev(6, 3, "view", 0), ev(7, 3, "click", 10),
        # u4: purchase only — stage 0 (no view anchor)
        ev(8, 4, "purchase", 0),
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet")
    out = {r.user_id: r for r in events_funnel(spark, str(tmp_path)).collect()}
    assert out[1].reached_stage == 3 and out[1].converted
    assert out[2].reached_stage == 1 and out[2].click_ts_us is None
    assert out[3].reached_stage == 1
    assert out[4].reached_stage == 0
    assert out[1].click_ts_us - out[1].view_ts_us == day_us
