"""Round-8 operator tests: progressive chroma-subsampled JPEG decode
(the last non-library-bound JPEG seam) and T.81 sampling factors up
to 4 (llm/multimodal.py)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F


# --------------- progressive 4:2:0 / 4:2:2 decode (multimodal.py, r8)


def test_progressive_subsampled_equals_sequential():
    """A progressive scan script must never change pixels: for the same
    quantized coefficients, the progressive 4:2:0/4:2:2 decode (MCU-
    interleaved DC with dummy blocks, real-grid AC scans, the full
    successive-approximation ladder) equals the sequential subsampled
    decode bit-for-bit."""
    from dbt_jaffleshop_spark.llm.multimodal import (
        _make_jpeg_420_coefs,
        jpeg_decode_color,
        jpeg_encode_progressive_sampled_coefs,
        jpeg_encode_sampled_coefs,
    )

    coefs_420 = _make_jpeg_420_coefs()
    for doc_id in range(0, 30, 3):
        w, h = 8 + doc_id % 17, 8 + (doc_id * 3 + 11) % 17
        nmx, nmy = (w + 15) // 16, (h + 15) // 16
        luma, chroma = coefs_420(doc_id, nmy, nmx)
        base = jpeg_decode_color(
            jpeg_encode_sampled_coefs(luma, chroma, w, h, 2, 2)
        )
        for al in (0, 1, 2):
            split = 1 + doc_id % 20
            prog = jpeg_decode_color(
                jpeg_encode_progressive_sampled_coefs(
                    luma, chroma, w, h, 2, 2,
                    bands=((1, split), (split + 1, 63)), al=al,
                )
            )
            assert prog.shape == (h, w, 3)
            assert (prog == base).all(), (doc_id, al)

    # 4:2:2 (hy=2, vy=1): the non-square MCU geometry
    for doc_id in range(5):
        w, h = 10 + doc_id * 3, 9 + doc_id * 2
        nmx, nmy = (w + 15) // 16, (h + 7) // 8
        luma = np.zeros((nmy, 2 * nmx, 8, 8), np.int32)
        luma[..., 0, 0] = (
            doc_id + np.arange(2 * nmx)[None, :, None, None][..., 0, 0]
        ) % 21 - 10
        chroma = np.zeros((2, nmy, nmx, 8, 8), np.int32)
        chroma[..., 0, 0] = doc_id - 2
        base = jpeg_decode_color(
            jpeg_encode_sampled_coefs(luma, chroma, w, h, 2, 1)
        )
        prog = jpeg_decode_color(
            jpeg_encode_progressive_sampled_coefs(
                luma, chroma, w, h, 2, 1, al=1
            )
        )
        assert (prog == base).all(), doc_id


def test_sampling_factors_up_to_four():
    """T.81 B.2.2 allows Hi/Vi in 1..4 (r8: the old gate stopped at 2):
    4:1:1-style geometries decode, progressive == sequential, and a
    factor outside 1..4 is a ValueError (corrupt header), not an
    unsupported-feature gate."""
    from dbt_jaffleshop_spark.llm.multimodal import (
        jpeg_decode_color,
        jpeg_encode_progressive_sampled_coefs,
        jpeg_encode_sampled_coefs,
    )

    for hy, vy in ((4, 1), (4, 2), (3, 1), (1, 4)):
        w, h = 20, 13
        nmx = (w + 8 * hy - 1) // (8 * hy)
        nmy = (h + 8 * vy - 1) // (8 * vy)
        luma = np.zeros((vy * nmy, hy * nmx, 8, 8), np.int32)
        for by in range(vy * nmy):
            for bx in range(hy * nmx):
                luma[by, bx, 0, 0] = (5 + bx * 3 + by * 7) % 41 - 20
                luma[by, bx, 4, 4] = (bx + by * 13) % 7 - 3
        chroma = np.zeros((2, nmy, nmx, 8, 8), np.int32)
        chroma[..., 0, 0] = 4
        rgb = jpeg_decode_color(
            jpeg_encode_sampled_coefs(luma, chroma, w, h, hy, vy)
        )
        assert rgb.shape == (h, w, 3), (hy, vy)
        prog = jpeg_decode_color(
            jpeg_encode_progressive_sampled_coefs(
                luma, chroma, w, h, hy, vy, al=1
            )
        )
        assert (prog == rgb).all(), (hy, vy)

    # factor 5 is outside the standard: corrupt-header contract
    bad = bytearray(
        jpeg_encode_sampled_coefs(
            np.zeros((1, 2, 8, 8), np.int32),
            np.zeros((2, 1, 1, 8, 8), np.int32),
            16, 8, 2, 1,
        )
    )
    sof_at = bytes(bad).find(b"\xff\xc0")
    bad[sof_at + 11] = 0x51  # Y component's (hi, vi) -> 5x1
    with pytest.raises(ValueError, match="1..4"):
        jpeg_decode_color(bytes(bad))


def test_dri_inside_progressive_frames():
    """DRI restart markers inside progressive scans (r8 — previously an
    honest NotImplementedError): every scan kind realigns at RSTm with
    cycling sequence numbers, DC scans reset their predictors, AC scans
    terminate the EOB run at the marker. Pixels must equal the no-DRI
    stream of the same blocks, for gray, 4:4:4 color, and 4:2:0."""
    from dbt_jaffleshop_spark.llm import multimodal as mm

    tc = mm._make_jpeg_test_coefs()
    for doc_id in (0, 5, 9):
        w, h = 24 + doc_id, 25 + doc_id
        nbx, nby = (w + 7) // 8, (h + 7) // 8
        c = tc(doc_id, nby, nbx)
        base = mm.jpeg_decode_gray(
            mm.jpeg_encode_progressive_coefs(c, w, h, al=1)
        )
        for ri in (1, 2, 3):
            payload = mm.jpeg_encode_progressive_coefs(
                c, w, h, al=1, restart_interval=ri
            )
            assert b"\xff\xdd" in payload  # DRI declared
            assert payload.count(b"\xff\xd0") > 0  # RST0 present
            assert (mm.jpeg_decode_gray(payload) == base).all(), (doc_id, ri)

    cc = mm._make_jpeg_color_coefs()
    c3 = cc(4, 3, 3)
    base3 = mm.jpeg_decode_color(
        mm.jpeg_encode_progressive3_coefs(c3, 22, 21, al=1)
    )
    got3 = mm.jpeg_decode_color(
        mm.jpeg_encode_progressive3_coefs(c3, 22, 21, al=1, restart_interval=2)
    )
    assert (got3 == base3).all()

    luma, chroma = mm._jpeg_420_coefs(7, 2, 2)
    base420 = mm.jpeg_decode_color(
        mm.jpeg_encode_progressive_sampled_coefs(luma, chroma, 30, 28, 2, 2, al=2)
    )
    got420 = mm.jpeg_decode_color(
        mm.jpeg_encode_progressive_sampled_coefs(
            luma, chroma, 30, 28, 2, 2, al=2, restart_interval=1
        )
    )
    assert (got420 == base420).all()


def test_bucketed_join_is_shuffle_free_and_exact(spark, sf_dir, tmp_path):
    """Bucketed co-located joins (functions/bucketing.py, r8): two fact
    relations written bucketed on the join key sort-merge-join with NO
    Exchange on either side — the write-once/join-many 100 TB pattern —
    and the result is row-identical to the plain join."""
    from dbt_jaffleshop_spark.functions.bucketing import (
        bucketed_join,
        write_bucketed,
    )
    from dbt_jaffleshop_spark.sources import load_table

    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_totalprice"
    )
    items = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_extendedprice"
    ).withColumnRenamed("l_orderkey", "o_orderkey")

    write_bucketed(orders, "b_orders", "o_orderkey", 8,
                   path=str(tmp_path / "b_orders"))
    write_bucketed(items, "b_items", "o_orderkey", 8,
                   path=str(tmp_path / "b_items"))
    try:
        # forbid the broadcast escape hatch: the no-Exchange claim must
        # hold for the fact-to-fact (sort-merge) shape
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = bucketed_join(spark, "b_orders", "b_items", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan  # co-located: no shuffle
        assert "Bucketed: true" in plan, plan

        expect = orders.join(items, "o_orderkey").count()
        assert joined.count() == expect > 0
        # exact content, not just count (integer cents: float-sum order
        # differs between the bucketed and shuffled plans)
        cents = (
            F.round(F.col("o_totalprice") * 100).cast("long")
            + F.round(F.col("l_extendedprice") * 100).cast("long")
        )
        a = joined.agg(F.sum(cents)).first()[0]
        b = orders.join(items, "o_orderkey").agg(F.sum(cents)).first()[0]
        assert a == b
    finally:
        spark.conf.set(
            "spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024)
        )
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_items")


def test_progressive420_query_matches_oracle(spark, oracle, sf_dir):
    """The registered digest member: real progressive 4:2:0 synthesis +
    decode across the corpus slice vs DuckDB's half-resolution-chroma
    closed form (scan script is pixel-invariant, so the sequential
    oracle verifies the progressive decode exactly)."""
    from tests.conftest import assert_parity

    from dbt_jaffleshop_spark.llm import multimodal as mm

    assert_parity(
        mm.multimodal_progressive420_pixels(spark, sf_dir),
        oracle,
        mm.ORACLES["multimodal_progressive420_pixels"],
    )
