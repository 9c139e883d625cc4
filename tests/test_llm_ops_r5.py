"""Round-5 operator tests: JPEG SOFn header decode, BMP DIB-header
layout selection, the driver-registered audio decode query, attribution
restart, Markov transition mining, Zipf head, and table profiling."""

from __future__ import annotations

import struct

import pandas as pd
import pytest

from dbt_jaffleshop_spark.llm.multimodal import decode_media, parse_image_header


@pytest.fixture
def docs_dir(tmp_path):
    def write(rows):
        pd.DataFrame(
            [
                {"doc_id": i, "text": t, "lang": lang, "source": src,
                 "n_chars": len(t)}
                for i, (t, lang, src) in enumerate(rows)
            ]
        ).to_parquet(tmp_path / "documents.parquet")
        return str(tmp_path)

    return write


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", 2 + len(body)) + body


def test_jpeg_sof_decode_dependency_free():
    """JPEG dimensions decode without a codec library via the marker
    walk: APP0/COM/DHT segments before the frame header are skipped
    (DHT's 0xC4 is in the SOF numbering range but is NOT a frame
    header), and both baseline (SOF0) and progressive (SOF2) parse."""
    app0 = _seg(0xE0, b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    com = _seg(0xFE, b"not a frame header")
    dht = _seg(0xC4, b"\x00" + bytes(16))
    sof_body = (
        b"\x08" + struct.pack(">HH", 33, 47) + b"\x03"
        + b"\x01\x11\x00\x02\x11\x01\x03\x11\x01"
    )

    baseline = b"\xff\xd8" + app0 + com + dht + _seg(0xC0, sof_body) + b"\xff\xd9"
    assert decode_media(baseline, "image") == {
        "width": 47, "height": 33, "n_frames": 1,
    }

    progressive = b"\xff\xd8" + app0 + _seg(0xC2, sof_body) + b"\xff\xd9"
    assert decode_media(progressive, "image") == {
        "width": 47, "height": 33, "n_frames": 1,
    }

    # a JPEG with no SOF before the stream ends parses to None (the
    # capability-gated PIL path takes over, absent here)
    assert parse_image_header(b"\xff\xd8" + app0 + b"\xff\xd9") is None


def test_bmp_dib_header_layout_selection():
    """The DIB header-size field selects the BMP layout: >= 40 reads
    int32 dimensions, the 12-byte OS/2 BITMAPCOREHEADER reads uint16
    ones, and an unknown size returns None instead of garbage."""
    file_hdr = b"BM" + struct.pack("<IHHI", 122, 0, 0, 54)

    info = file_hdr + struct.pack(
        "<IiiHHIIiiII", 40, 9, -5, 1, 24, 0, 68, 0, 0, 0, 0
    )
    assert parse_image_header(info) == {"width": 9, "height": 5, "n_frames": 1}

    core = file_hdr + struct.pack("<IHHHH", 12, 640, 480, 1, 24)
    assert parse_image_header(core) == {
        "width": 640, "height": 480, "n_frames": 1,
    }

    # a 16-byte OS/2 v2 header would previously mis-unpack int32 fields
    unknown = file_hdr + struct.pack("<IHHHH", 16, 640, 480, 1, 24)
    assert parse_image_header(unknown) is None


def test_streaming_attribution_restart_no_duplicate_pairs(
    spark, oracle, sf_dir, tmp_path
):
    """Crash-restart exactly-once for the stream-stream interval join:
    run phase 1 over the early half of the events feed with a durable
    checkpoint, then add the late half and RE-RUN with the same
    checkpoint. The restart must resume from checkpointed offsets and
    join state — no (purchase, click) pair emitted twice, phase-1 output
    a subset of the final output, and the final output equal to the
    batch interval join over the full feed (the time split keeps every
    cross-phase click inside the 1 h watermark retention, so nothing is
    legitimately lost either)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from dbt_jaffleshop_spark.streaming import joins
    from tests.conftest import assert_parity

    t = pq.read_table(f"{sf_dir}/events.parquet")
    ts_us = pc.cast(t["ts"], "int64")
    cut = int(pc.quantile(ts_us, q=0.5).to_pylist()[0])
    feed = tmp_path / "feed"
    feed.mkdir()
    early = t.filter(pc.less_equal(ts_us, cut))
    late = t.filter(pc.greater(ts_us, cut))
    assert early.num_rows and late.num_rows
    pq.write_table(early, feed / "events-0.parquet")

    ckpt, out = str(tmp_path / "ckpt"), str(tmp_path / "out")
    phase1 = joins.streaming_attribution(
        spark, str(feed), checkpoint_dir=ckpt, output_dir=out
    )
    pairs1 = {(r.purchase_id, r.click_id) for r in phase1.collect()}

    pq.write_table(late, feed / "events-1.parquet")
    final = joins.streaming_attribution(
        spark, str(feed), checkpoint_dir=ckpt, output_dir=out
    )
    rows = final.collect()
    pairs = [(r.purchase_id, r.click_id) for r in rows]
    assert len(pairs) == len(set(pairs)), "restart re-emitted pairs"
    assert pairs1 <= set(pairs)
    # equal to the batch interval join over the ORIGINAL (un-split) feed
    assert_parity(final, oracle, joins.ORACLES["streaming_attribution"])


def test_events_transition_topk_planted_sequences(spark, tmp_path):
    """Hand-computable Markov transitions: user 1 emits v→c, c→p, p→v,
    v→c; user 2 emits v→c. So from 'v': c twice+... full counts below —
    and rates are exact integer bp of the per-source totals."""
    base = pd.Timestamp("2024-01-01")
    seq1 = ["v", "c", "p", "v", "c"]
    seq2 = ["v", "c"]
    rows = []
    for uid, seq in ((1, seq1), (2, seq2)):
        for i, et in enumerate(seq):
            rows.append(
                {"event_id": uid * 100 + i, "ts": base + pd.Timedelta(minutes=i),
                 "user_id": uid, "event_type": et, "value": 1.0, "props": "{}"}
            )
    pd.DataFrame(rows).to_parquet(tmp_path / "events.parquet")

    from dbt_jaffleshop_spark.llm.events import events_transition_topk

    got = {
        (r.prev_type, r.event_type): r
        for r in events_transition_topk(spark, str(tmp_path)).collect()
    }
    # transitions: u1: v→c, c→p, p→v, v→c; u2: v→c
    assert got[("v", "c")].n_transitions == 3
    assert got[("v", "c")].from_total == 3
    assert got[("v", "c")].rate_bp == 10000
    assert got[("c", "p")].n_transitions == 1
    assert got[("p", "v")].n_transitions == 1
    assert all(r.rank == 1 for r in got.values())
    assert len(got) == 3


def test_text_zipf_topk_planted_counts(spark, docs_dir):
    """Known vocabulary: 'a' ×5, 'b' ×3, 'c' ×2 over two docs — ranks,
    cumulative counts, and coverage bp are hand-computable; ties break
    on the term string."""
    from dbt_jaffleshop_spark.llm.text import text_zipf_topk

    rows = [("a a a b b c", "en", "s"), ("a a b c", "en", "s")]
    out = {r.rank: r for r in text_zipf_topk(spark, docs_dir(rows)).collect()}
    assert [(out[i].term, out[i].n_occurrences) for i in (1, 2, 3)] == [
        ("a", 5), ("b", 3), ("c", 2),
    ]
    assert [out[i].cum_occurrences for i in (1, 2, 3)] == [5, 8, 10]
    assert [out[i].cum_bp for i in (1, 2, 3)] == [5000, 8000, 10000]


def test_orders_profile_shape_and_consistency(spark, sf_dir):
    """One profile row per declared column, constant n_rows, and
    internally consistent stats (nulls ≤ rows, distinct ≤ non-null,
    min_repr ≤ max_repr within each column's repr space)."""
    from dbt_jaffleshop_spark.testing.profile import _SPECS, orders_profile

    rows = {r.col_name: r for r in orders_profile(spark, sf_dir).collect()}
    assert set(rows) == {name for name, _ in _SPECS}
    n_rows = {r.n_rows for r in rows.values()}
    assert len(n_rows) == 1 and n_rows.pop() > 0
    for r in rows.values():
        assert 0 <= r.n_null <= r.n_rows
        assert 0 < r.n_distinct <= r.n_rows - r.n_null
        assert r.min_repr is not None and r.max_repr is not None
    assert rows["o_orderkey"].n_distinct == rows["o_orderkey"].n_rows


def test_orders_quantiles_planted_distribution(spark, tmp_path):
    """Hand-computable exact quantiles incl. a tie-heavy month: the
    value at rank ceil(q·n) of the ascending cents sort."""
    rows = []

    def month(m, prices):
        for i, p in enumerate(prices):
            rows.append(
                {"o_orderkey": len(rows), "o_custkey": 1,
                 "o_orderstatus": "O", "o_totalprice": float(p),
                 "o_orderdate": pd.Timestamp(f"1995-{m:02d}-15"),
                 "o_orderpriority": "1-URGENT"}
            )

    month(1, range(1, 11))          # n=10: p50=ceil(5)=5th → 500 cents
    month(2, [7.0])                 # n=1: all quantiles = 700
    month(3, [1, 1, 1, 2, 2])      # n=5: k50=3 → 100; k90=k99=5 → 200
    pdf = pd.DataFrame(rows)
    pdf["o_orderdate"] = pdf["o_orderdate"].astype("datetime64[us]")
    pdf.to_parquet(tmp_path / "orders.parquet")

    from dbt_jaffleshop_spark.testing.profile import orders_quantiles

    got = {r.month: r for r in orders_quantiles(spark, str(tmp_path)).collect()}
    jan = got["1995-01"]
    assert (jan.n_orders, jan.p50_cents, jan.p90_cents, jan.p99_cents) == (
        10, 500, 900, 1000,
    )
    feb = got["1995-02"]
    assert (feb.p50_cents, feb.p90_cents, feb.p99_cents) == (700, 700, 700)
    mar = got["1995-03"]
    assert (mar.p50_cents, mar.p90_cents, mar.p99_cents) == (100, 200, 200)


def test_emb_kmeans_iter_planted_assignment(spark, tmp_path):
    """Hand-computable Lloyd step: 16 seed vectors (each its own cell —
    cosine 1 with itself) plus two extra vectors that are positive
    scalings of seeds 5 and 2 (cosine exactly 1 → tie-break picks the
    LOWEST cell, which is the scaled seed's own cell only when no
    earlier seed also hits cosine 1 — axis-aligned seeds guarantee
    that). New centroids are exact integer floor-div means."""
    import numpy as np

    from dbt_jaffleshop_spark.llm.common import EMB_SCALE
    from dbt_jaffleshop_spark.llm.similarity import emb_kmeans_iter

    dim = 4
    rng = []
    for i in range(16):
        v = [0.0] * dim
        v[i % dim] = 1.0 + 0.01 * i        # dominant axis
        v[(i + 1) % dim] = 0.2 + 0.03 * i  # big secondary spread: seeds
        # sharing a dominant axis stay clearly separated (cos ≪ 1), so
        # the ~1e-6 quantization wobble on the scaled copies' cosine
        # can never flip an assignment
        rng.append(v)
    v16 = [2 * x for x in rng[5]]   # cos=1 with seed 5 (and only 5)
    v17 = [3 * x for x in rng[2]]   # cos=1 with seed 2
    pd.DataFrame(
        {
            "vec_id": list(range(18)),
            "embedding": [np.array(v, dtype="float32") for v in rng + [v16, v17]],
            "label": [0] * 18,
        }
    ).to_parquet(tmp_path / "embeddings.parquet")

    out = emb_kmeans_iter(spark, str(tmp_path))
    rows = out.collect()
    assert len(rows) == 16 * dim
    members = {r.cell: r.n_members for r in rows if r.dim == 0}
    assert members[5] == 2 and members[2] == 2
    assert sum(members.values()) == 18
    # exact integer M-step on cell 5, dim of its main axis
    q = lambda x: int(round(x * EMB_SCALE))
    axis = 5 % dim
    got = {(r.cell, r.dim): r for r in rows}[(5, axis)]
    s = q(rng[5][axis]) + q(v16[axis])
    assert got.sum_coord == s
    assert got.mean_coord == s // 2


def test_multimodal_audio_runs_real_decoder(spark, sf_dir):
    """The registered query synthesizes REAL WAV bytes and the output
    comes from the actual parse path: independently rebuild one doc's
    expected features from the synthesis formula and compare."""
    import numpy as np

    from dbt_jaffleshop_spark.llm.multimodal import AUDIO_RATE, multimodal_audio
    from dbt_jaffleshop_spark.sources import load_table

    rows = {r.doc_id: r for r in multimodal_audio(spark, sf_dir).collect()}
    docs = dict(
        load_table(spark, "documents", sf_dir)
        .selectExpr("doc_id", "length(encode(text, 'UTF-8')) n")
        .collect()
    )
    audio_ids = [d for d in docs if d % 3 == 1]
    assert set(rows) == set(audio_ids)

    doc_id = min(audio_ids)
    channels = 1 + doc_id % 2
    frames = 120 + docs[doc_id] % 200
    k = np.arange(frames * channels, dtype="int64")
    vals = (doc_id * 31 + k * 7) % 2003 - 1001
    r = rows[doc_id]
    assert (r.sample_rate, r.n_channels, r.n_samples) == (
        AUDIO_RATE, channels, frames,
    )
    assert r.duration_ms == frames * 1000 // AUDIO_RATE
    assert r.rms_q == int(np.sqrt(np.mean(vals**2)))
