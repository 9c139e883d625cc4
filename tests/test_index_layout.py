"""r12 (VERDICT r11 item 1): the index hash-partition layout is INDEX
STATE, not a compile-time constant — recorded in the meta row at build,
derived from meta by every operation (a differently-compiled constant
can never mis-scope a partition replace), cross-checked against the
manifest rider every partitioned commit records (hand-edited pointers
are refused loudly), and changed by the meta-transactional
``repartition_index``."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from dbt_jaffleshop_spark.llm import dedup_incremental as di
from dbt_jaffleshop_spark.sources import load_table


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _dirs(table):
    return sorted(
        int(d.split("=")[1])
        for d in os.listdir(table.data_dir)
        if d.startswith(di._PB + "=")
    )


def _docs(spark, sf_dir):
    return load_table(spark, "documents", sf_dir).select("doc_id", "text")


def _full_recompute(spark, docs):
    from dbt_jaffleshop_spark.llm.dedup import (
        _lsh_bands,
        _minhash_signatures_from,
        _shingle_table,
        _star_candidates,
        _star_components,
        _verify_jaccard,
    )

    sh = _shingle_table(docs)
    bands = _lsh_bands(_minhash_signatures_from(sh))
    pairs = _verify_jaccard(_star_candidates(bands), sh).select(
        "doc_a", "doc_b"
    )
    return _star_components(pairs)


def test_meta_governs_the_layout_not_the_module_constant(
    spark, sf_dir, tmp_path, monkeypatch
):
    """The r11 verdict's failure mode — 'an index built at one constant
    read by code compiled with another computes p_bucket values that
    mismatch the stored directories' — is impossible by construction:
    build at n=4, then run fold AND removal under a monkeypatched
    module constant of 64. Every bucket derivation reads the META
    value, so the lifecycle still lands exactly on the full recompute
    and no directory above 3 ever appears."""
    docs = _docs(spark, sf_dir)
    thr = di._split_threshold(docs)
    idx = di.build_dedup_index(
        spark, docs.where(F.col("doc_id") <= thr),
        str(tmp_path / "idx"), n_doc_buckets=4,
    )
    assert di._n_buckets(idx.snapshot(spark)[1]) == 4
    monkeypatch.setattr(di, "N_DOC_BUCKETS", 64)
    di.incremental_update(spark, docs.where(F.col("doc_id") > thr), idx)
    out = di.remove_docs(
        spark, docs.where(F.col("doc_id") % 11 == 2).select("doc_id"), idx
    )
    surviving = docs.where(F.col("doc_id") % 11 != 2)
    assert _rows(out) == _rows(_full_recompute(spark, surviving))
    for t in idx._PB_TABLES:
        assert max(_dirs(getattr(idx, t)), default=0) <= 3


def test_repartition_is_layout_only_and_folds_compose_after_it(
    spark, sf_dir, tmp_path
):
    """repartition_index(4 → 8): logical content identical before and
    after (pure layout), the data lands in the new directory domain,
    a SUBSEQUENT fold + removal derive buckets at the new count
    automatically and still equal the full recompute, and vacuum
    reclaims the superseded files."""
    docs = _docs(spark, sf_dir)
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    t1, t2 = mx * 6 // 10, mx * 8 // 10
    idx = di.build_dedup_index(
        spark, docs.where(F.col("doc_id") <= t1),
        str(tmp_path / "idx"), n_doc_buckets=4,
    )
    before = _rows(idx.clusters_df(spark))
    v = di.repartition_index(spark, idx, 8)
    assert di._n_buckets(idx.snapshot(spark)[1]) == 8
    assert _rows(idx.clusters_df(spark)) == before  # layout only
    # bucket_mins is band-partitioned: untouched, version carried
    assert v["bucket_mins"] == idx.snapshot(spark)[1]["bucket_mins_v"]
    di.incremental_update(
        spark,
        docs.where((F.col("doc_id") > t1) & (F.col("doc_id") <= t2)),
        idx,
    )
    di.incremental_update(spark, docs.where(F.col("doc_id") > t2), idx)
    out = di.remove_docs(
        spark, docs.where(F.col("doc_id") % 13 == 1).select("doc_id"), idx
    )
    surviving = docs.where(F.col("doc_id") % 13 != 1)
    assert _rows(out) == _rows(_full_recompute(spark, surviving))
    # the new layout is physically in effect (buckets above the old
    # domain exist) and vacuum reclaims the pre-repartition files
    assert max(_dirs(idx.clusters)) > 3
    assert sum(idx.vacuum(keep_last=1).values()) > 0
    assert _rows(idx.clusters_df(spark)) is not None  # still readable


def test_repartition_refuses_bad_counts_and_noops_on_equal(
    spark, sf_dir, tmp_path
):
    docs = _docs(spark, sf_dir)
    idx = di.build_dedup_index(
        spark, docs, str(tmp_path / "idx"), n_doc_buckets=4
    )
    with pytest.raises(ValueError, match="n_doc_buckets"):
        di.repartition_index(spark, idx, 0)
    meta_v = idx.meta.current_version()
    v = di.repartition_index(spark, idx, 4)  # no-op: nothing rewritten
    assert idx.meta.current_version() == meta_v
    assert v["clusters"] == idx.snapshot(spark)[1]["clusters_v"]
    with pytest.raises(ValueError, match="n_doc_buckets"):
        di.build_dedup_index(spark, docs, str(tmp_path / "bad"), n_doc_buckets=0)


def test_layout_mismatch_is_refused_loudly(spark, sf_dir, tmp_path):
    """A meta pointer whose declared bucket count disagrees with the
    layout the pinned data tables were written at (hand-edit, restore
    of a pre-repartition meta, code bug) must refuse EVERY operation
    with an explicit layout error — the silent alternative is partition
    replaces targeting the wrong directories."""
    docs = _docs(spark, sf_dir)
    idx = di.build_dedup_index(
        spark, docs, str(tmp_path / "idx"), n_doc_buckets=4
    )
    _v, snap = idx.snapshot(spark)
    # corrupt the pointer: same table versions, wrong layout claim
    idx._commit_meta(
        spark,
        int(snap["max_doc_id"]),
        {t: int(snap[f"{t}_v"]) for t in idx._TABLES},
        expected_meta_v=None,
        n_doc_buckets=7,
    )
    with pytest.raises(ValueError, match="layout mismatch"):
        idx.snapshot(spark)
    with pytest.raises(ValueError, match="layout mismatch"):
        di.incremental_update(
            spark, docs.limit(0), idx
        )


def test_emb_index_layout_in_meta_and_repartition(spark, sf_dir, tmp_path):
    """The embedding flavor: build at n=4, repartition to 8, fold and
    remove at the new layout — end state equals the all-pairs-LSH
    full recompute over the surviving vectors, and extra_bits rides
    through the repartition unchanged."""
    from dbt_jaffleshop_spark.llm.dedup import _quantize_frame

    emb = load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "embedding"
    )
    thr = di._split_threshold(emb, "vec_id")
    idx = di.build_emb_index(
        spark, emb.where(F.col("vec_id") <= thr),
        str(tmp_path / "emb"), n_doc_buckets=4,
    )
    di.repartition_index(spark, idx, 8)
    _v, snap = idx.snapshot(spark)
    assert di._n_buckets(snap) == 8
    assert int(snap["extra_bits"] or 0) == 0  # rider carried
    di.emb_incremental_update(spark, emb.where(F.col("vec_id") > thr), idx)
    out = di.remove_vecs(
        spark, emb.where(F.col("vec_id") % 9 == 4).select("vec_id"), idx
    )
    surviving = emb.where(F.col("vec_id") % 9 != 4)
    assert _rows(out) == _rows(
        di.emb_clusters_lsh_over(_quantize_frame(surviving))
    )


def test_compaction_preserves_the_layout_rider(spark, sf_dir, tmp_path):
    """compact_index rewrites files, never state: after a compaction the
    manifest rider still declares the layout, so the snapshot
    cross-check keeps protecting every later operation."""
    docs = _docs(spark, sf_dir)
    idx = di.build_dedup_index(
        spark, docs, str(tmp_path / "idx"), n_doc_buckets=4
    )
    di.compact_index(spark, idx)
    _v, snap = idx.snapshot(spark)  # cross-check still passes
    assert di._n_buckets(snap) == 4
    m = idx.clusters.manifest(int(snap["clusters_v"]))
    assert m["meta"][di._LAYOUT_KEY] == 4


def test_layout_rewrites_emit_no_cdc_events(spark, sf_dir, tmp_path):
    """r12 review: repartition_index and compact_index rewrite FILES,
    never rows (p_bucket is derived state), so the changes() CDC feed
    over any index data table must skip their commits — the same
    data_change=False contract as AcidTable.compact."""
    docs = _docs(spark, sf_dir)
    idx = di.build_dedup_index(
        spark, docs, str(tmp_path / "idx"), n_doc_buckets=4
    )
    v0 = idx.clusters.current_version()
    di.repartition_index(spark, idx, 8)
    di.compact_index(spark, idx)
    feed = idx.clusters.changes(spark, v0)
    assert feed.count() == 0


def test_meta_row_arity_drift_is_refused(spark, sf_dir, tmp_path):
    """r12 review: the driver-side meta writer must refuse a row whose
    arity disagrees with the DDL instead of zip-truncating into a
    short row the layout fallbacks would silently mask."""
    docs = _docs(spark, sf_dir)
    idx = di.build_dedup_index(spark, docs, str(tmp_path / "idx"))
    with pytest.raises(ValueError, match="drift"):
        di._write_meta_row(
            idx.meta, (1, 2, 3), idx._META_DDL, validate=None
        )


def test_streaming_fold_builds_at_custom_layout_and_survives_repartition(
    spark, sf_dir, tmp_path
):
    """r12: the streaming sink can seed the index at a chosen layout,
    and a repartition_index run BETWEEN streams is invisible to later
    folds — they derive buckets from the committed meta, and the
    restarted stream lands exactly on the full recompute."""
    from dbt_jaffleshop_spark.streaming.index_fold import (
        streaming_documents_fold,
    )

    docs = _docs(spark, sf_dir)
    mx = docs.agg(F.max("doc_id")).collect()[0][0]
    thr = mx * 6 // 10
    src = str(tmp_path / "feed")
    docs.where(F.col("doc_id") <= thr).repartition(1).write.parquet(
        src, mode="overwrite"
    )
    root = str(tmp_path / "idx")
    idx = streaming_documents_fold(spark, src, root, n_doc_buckets=4)
    assert di._n_buckets(idx.snapshot(spark)[1]) == 4
    di.repartition_index(spark, idx, 8)
    # a later batch file arrives; the restarted stream folds it at the
    # NEW layout read from meta
    docs.where(F.col("doc_id") > thr).repartition(1).write.parquet(
        src + "/late", mode="overwrite"
    )
    import glob
    import shutil

    for f in glob.glob(src + "/late/*.parquet"):
        shutil.move(f, src + "/" + os.path.basename(f))
    shutil.rmtree(src + "/late", ignore_errors=True)
    idx = streaming_documents_fold(spark, src, root)
    assert di._n_buckets(idx.snapshot(spark)[1]) == 8
    assert _rows(idx.clusters_df(spark)) == _rows(
        _full_recompute(spark, docs)
    )
