"""Persisted IVF ANN index (r11, llm/ann_index.py): build / append /
search / retrain behind the meta transaction, with the zero-iteration
index pinned bit-for-bit to the driver-verified sim_ivf_* search
operators — persistence and maintenance must be pure layout."""

import tempfile

from pyspark.sql import functions as F

from dbt_jaffleshop_spark.llm import ann_index as ai
from dbt_jaffleshop_spark.llm.similarity import (
    IVF_NPROBE,
    IVF_TOP_K,
    QUERY_STRIDE,
    sim_ivf_probe2_topk,
    sim_ivf_topk,
)
from dbt_jaffleshop_spark.sources import load_table


def _rows(df):
    return sorted(map(tuple, df.collect()))


def _emb(spark, sf_dir):
    return load_table(spark, "embeddings", sf_dir).select(
        "vec_id", "embedding"
    )


def _queries(emb):
    return emb.where(F.col("vec_id") % QUERY_STRIDE == 0)


def test_zero_iter_index_matches_verified_search_ops(spark, sf_dir):
    """Anchor: an untrained index (seed centroids) must answer the
    oracle-checked sim_ivf_topk AND sim_ivf_probe2_topk queries
    identically — ranks, neighbors, and exact cosines."""
    emb = _emb(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ann_idx_zero_")
    idx = ai.build_ann_index(spark, emb, root, train_iters=0)

    got1 = ai.ann_search(
        spark, idx, _queries(emb), k=IVF_TOP_K, n_probes=1
    )
    assert _rows(got1) == _rows(sim_ivf_topk(spark, sf_dir))

    got2 = ai.ann_search(
        spark, idx, _queries(emb), k=IVF_TOP_K, n_probes=IVF_NPROBE
    )
    assert _rows(got2) == _rows(sim_ivf_probe2_topk(spark, sf_dir))


def test_append_is_exact_assignment_against_stored_centroids(spark, sf_dir):
    """An appended delta must land exactly where a full assignment of
    the whole corpus against the SAME stored centroids lands — appends
    are O(delta) and drift-free between retrains. The id high-water
    mark is enforced like the dedup folds."""
    import pytest

    from dbt_jaffleshop_spark.llm.dedup import _quantize_frame
    from dbt_jaffleshop_spark.llm.similarity import _assign_to

    emb = _emb(spark, sf_dir)
    mx = emb.agg(F.max("vec_id")).collect()[0][0]
    thr = mx * 7 // 10
    root = tempfile.mkdtemp(prefix="ann_idx_append_")
    idx = ai.build_ann_index(
        spark, emb.where(F.col("vec_id") <= thr), root, train_iters=1
    )
    ai.append_vectors(spark, emb.where(F.col("vec_id") > thr), idx)
    assert idx.max_vec_id(spark) == mx

    _v, snap = idx.snapshot(spark)
    cents = idx.centroids.read(spark, version=snap["centroids_v"]).select(
        "cell", "ce", "cn"
    )
    want = _assign_to(_quantize_frame(emb), cents).select(
        "vec_id", "cell"
    )
    got = idx.vectors.read(spark, version=snap["vectors_v"]).select(
        "vec_id", "cell"
    )
    assert _rows(got) == _rows(want)

    with pytest.raises(ValueError, match="high-water mark"):
        ai.append_vectors(
            spark, emb.where(F.col("vec_id") <= thr), idx
        )


def test_retrain_equals_from_scratch_at_cumulative_iters(spark, sf_dir):
    """build(T=0) + retrain(2) ≡ build(T=2): centroids, assignments,
    and search answers all equal — periodic retraining introduces no
    drift beyond the training itself. The meta rider records the
    cumulative count."""
    emb = _emb(spark, sf_dir)
    root_a = tempfile.mkdtemp(prefix="ann_idx_ra_")
    root_b = tempfile.mkdtemp(prefix="ann_idx_rb_")
    fresh = ai.build_ann_index(spark, emb, root_a, train_iters=2)
    idx = ai.build_ann_index(spark, emb, root_b, train_iters=0)
    ai.retrain_ann_index(spark, idx, train_iters=2)

    assert int(idx.snapshot(spark)[1]["train_iters"]) == 2
    cents = lambda i: _rows(  # noqa: E731
        i.centroids.read(spark).select("cell", "ce", "cn")
    )
    assert cents(idx) == cents(fresh)
    assert _rows(
        idx.vectors.read(spark).select("vec_id", "cell")
    ) == _rows(fresh.vectors.read(spark).select("vec_id", "cell"))
    q = _queries(emb)
    assert _rows(ai.ann_search(spark, idx, q, k=3, n_probes=2)) == _rows(
        ai.ann_search(spark, fresh, q, k=3, n_probes=2)
    )


def test_search_scan_prunes_to_probed_cells(spark, sf_dir):
    """The physical IVF contract: the candidate scan carries a
    PartitionFilters entry on the cell column, so an n_probes search
    reads only the probed cells' files."""
    emb = _emb(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ann_idx_prune_")
    idx = ai.build_ann_index(spark, emb, root, train_iters=1)
    one_query = emb.where(
        F.col("vec_id") == emb.agg(F.max("vec_id")).collect()[0][0]
    )
    out = ai.ann_search(spark, idx, one_query, k=3, n_probes=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    scan = plan.split("PartitionFilters", 1)
    assert len(scan) == 2 and "cell" in scan[1].split("]", 1)[0], plan
    assert out.count() <= 3


def test_ann_index_vacuum_pin_and_compaction(spark, sf_dir):
    """The maintenance surface is shared with the dedup indexes:
    vacuum pin-protects the meta-referenced versions against stacked
    garbage commits, and compact_index carries the train_iters rider
    through the meta swap with state unchanged."""
    from dbt_jaffleshop_spark.llm.dedup_incremental import compact_index

    emb = _emb(spark, sf_dir)
    mx = emb.agg(F.max("vec_id")).collect()[0][0]
    thr = mx * 7 // 10
    root = tempfile.mkdtemp(prefix="ann_idx_vac_")
    idx = ai.build_ann_index(
        spark, emb.where(F.col("vec_id") <= thr), root, train_iters=1
    )
    ai.append_vectors(spark, emb.where(F.col("vec_id") > thr), idx)
    before = _rows(idx.vectors.read(spark).select("vec_id", "cell"))

    junk = spark.createDataFrame(
        [(10**9, [1], 1, 0)], "vec_id bigint, e array<bigint>, nrm bigint, cell int"
    )
    idx.vectors.overwrite(junk)
    idx.vectors.overwrite(junk)
    idx.vacuum(keep_last=2)
    _v, snap = idx.snapshot(spark)
    assert (
        _rows(
            idx.vectors.read(spark, version=snap["vectors_v"]).select(
                "vec_id", "cell"
            )
        )
        == before
    )

    compact_index(spark, idx)
    _v, snap2 = idx.snapshot(spark)
    assert int(snap2["train_iters"]) == 1
    assert (
        _rows(idx.vectors.read(spark).select("vec_id", "cell")) == before
    )


def test_streaming_append_builds_then_appends_exactly_once(
    spark, sf_dir, tmp_path
):
    """Embedding batches arriving as files: first batch trains+builds,
    the second appends against the stored centroids; a replay run on
    the same checkpoint changes nothing, and the end state equals a
    build+append done directly."""
    import os
    import time

    from dbt_jaffleshop_spark.streaming.index_fold import (
        streaming_vectors_append,
    )

    emb = _emb(spark, sf_dir)
    mx = emb.agg(F.max("vec_id")).collect()[0][0]
    thr = mx * 7 // 10
    src = str(tmp_path / "feed")
    os.makedirs(src)

    def land(df, name):
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / name))
        part = next(
            f
            for f in os.listdir(str(tmp_path / name))
            if f.endswith(".parquet")
        )
        os.replace(
            os.path.join(str(tmp_path / name), part),
            os.path.join(src, name + ".parquet"),
        )
        time.sleep(1.1)

    land(emb.where(F.col("vec_id") <= thr), "b0")
    land(emb.where(F.col("vec_id") > thr), "b1")
    root = str(tmp_path / "idx")
    idx = streaming_vectors_append(
        spark, src, root, train_iters=1, max_files_per_trigger=1
    )
    assert idx.max_vec_id(spark) == mx
    meta_v = idx.meta.current_version()

    # direct twin: same build slice + same delta
    root2 = str(tmp_path / "idx2")
    direct = ai.build_ann_index(
        spark, emb.where(F.col("vec_id") <= thr), root2, train_iters=1
    )
    ai.append_vectors(spark, emb.where(F.col("vec_id") > thr), direct)
    assert _rows(idx.vectors.read(spark).select("vec_id", "cell")) == _rows(
        direct.vectors.read(spark).select("vec_id", "cell")
    )

    # replay: nothing moves
    streaming_vectors_append(spark, src, root, max_files_per_trigger=1)
    assert idx.meta.current_version() == meta_v


def test_adc_search_matches_sim_ivfpq_and_survives_lifecycle(
    spark, sf_dir
):
    """The persisted PQ layer: a zero-iteration index's ADC search
    answers the oracle-verified sim_ivfpq_topk bit-for-bit; after an
    append the codes table equals a full re-encode against the frozen
    codebook; after a retrain the code payloads are unchanged and only
    re-homed to the new cells."""
    from dbt_jaffleshop_spark.llm.similarity import sim_ivfpq_topk

    emb = _emb(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ann_idx_adc_")
    idx = ai.build_ann_index(spark, emb, root, train_iters=0)
    got = ai.ann_search_adc(
        spark, idx, _queries(emb), k=IVF_TOP_K, n_probes=1
    )
    assert _rows(got) == _rows(sim_ivfpq_topk(spark, sf_dir))

    # lifecycle: build 70% → append 30% → codes ≡ full re-encode
    mx = emb.agg(F.max("vec_id")).collect()[0][0]
    thr = mx * 7 // 10
    root2 = tempfile.mkdtemp(prefix="ann_idx_adc2_")
    idx2 = ai.build_ann_index(
        spark, emb.where(F.col("vec_id") <= thr), root2, train_iters=1
    )
    ai.append_vectors(spark, emb.where(F.col("vec_id") > thr), idx2)
    _v, snap = idx2.snapshot(spark)
    payload_before = _rows(
        idx2.codes.read(spark, version=snap["codes_v"]).select(
            "vec_id", "codes", "recon_nrm"
        )
    )
    # retrain re-homes code rows; payloads identical
    ai.retrain_ann_index(spark, idx2, train_iters=1)
    _v, snap2 = idx2.snapshot(spark)
    payload_after = _rows(
        idx2.codes.read(spark, version=snap2["codes_v"]).select(
            "vec_id", "codes", "recon_nrm"
        )
    )
    assert payload_after == payload_before
    # code rows sit in the vectors' (possibly new) cells
    vc = _rows(idx2.vectors.read(spark).select("vec_id", "cell"))
    cc = _rows(idx2.codes.read(spark).select("vec_id", "cell"))
    assert vc == cc
    # and the ADC plan prunes on the codes partition column
    one_query = emb.where(F.col("vec_id") == mx)
    import re

    out = ai.ann_search_adc(spark, idx2, one_query, k=3, n_probes=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the codebook scan legitimately carries an EMPTY PartitionFilters
    # (unpartitioned table); the CODES scan must carry one on cell
    segs = re.findall(r"PartitionFilters: \[([^\]]*)", plan)
    assert any("cell" in seg for seg in segs), plan


def test_remove_vectors_is_exact_filter_and_partition_scoped(
    spark, sf_dir
):
    """Removal ≡ filter: post-removal vectors/codes equal the pre
    content minus the removed ids (both search paths read only these
    tables, so this pin fixes every future search), centroids/codebook
    and the id high-water mark are untouched, untouched cells' files
    carry by REFERENCE (removal I/O is O(affected cells)), and a
    replayed removal is a no-op."""
    emb = _emb(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ann_idx_rm_")
    idx = ai.build_ann_index(spark, emb, root, train_iters=1)
    _v0, snap0 = idx.snapshot(spark)
    pre_vecs = idx.vectors.read(spark)
    pre_codes = idx.codes.read(spark)
    pre_v = _rows(pre_vecs)
    pre_c = _rows(pre_codes)
    pre_manifest = idx.vectors.manifest(snap0["vectors_v"])

    rem = emb.where(F.col("vec_id") % 17 == 0).select("vec_id")
    rem_ids = {r[0] for r in rem.collect()}
    hit_cells = {
        r[0]
        for r in pre_vecs.join(rem, "vec_id", "left_semi")
        .select("cell")
        .distinct()
        .collect()
    }
    ai.remove_vectors(spark, rem, idx)

    _v1, snap1 = idx.snapshot(spark)
    assert int(snap1["centroids_v"]) == int(snap0["centroids_v"])
    assert int(snap1["codebook_v"]) == int(snap0["codebook_v"])
    assert int(snap1["max_vec_id"]) == int(snap0["max_vec_id"])
    assert int(snap1["train_iters"]) == 1
    got_v = _rows(idx.vectors.read(spark, version=snap1["vectors_v"]))
    got_c = _rows(idx.codes.read(spark, version=snap1["codes_v"]))
    assert got_v == [r for r in pre_v if r[0] not in rem_ids]
    assert got_c == [r for r in pre_c if r[0] not in rem_ids]

    # partition-scoped I/O: every untouched cell's files are the SAME
    # file names as the pinned base — only hit cells staged new files
    post_manifest = idx.vectors.manifest(snap1["vectors_v"])
    by_cell = lambda m: {  # noqa: E731
        f.split("/", 1)[0]: sorted(
            x for x in m["files"] if x.split("/", 1)[0] == f.split("/", 1)[0]
        )
        for f in m["files"]
    }
    pre_parts, post_parts = by_cell(pre_manifest), by_cell(post_manifest)
    for part, files in post_parts.items():
        cell_val = int(part.split("=", 1)[1])
        if cell_val in hit_cells:
            assert files != pre_parts.get(part), part
        else:
            assert files == pre_parts[part], part

    # searches never surface a removed id
    q = _queries(emb)
    for search in (ai.ann_search, ai.ann_search_adc):
        out = search(spark, idx, q, k=3, n_probes=2)
        assert not set(
            r[0] for r in out.select("neighbor_id").distinct().collect()
        ) & rem_ids

    # replayed removal: nothing stored matches -> no commit
    v_before = idx.meta.current_version()
    ai.remove_vectors(spark, rem, idx)
    assert idx.meta.current_version() == v_before


def test_remove_vectors_keeps_high_water_mark_and_append_order(
    spark, sf_dir
):
    """Removing the NEWEST vector must not lower the id high-water
    mark: ids are never reused, so a replayed streaming batch at the
    old max is still refused and only genuinely-new ids append."""
    import pytest

    emb = _emb(spark, sf_dir)
    mx = emb.agg(F.max("vec_id")).collect()[0][0]
    root = tempfile.mkdtemp(prefix="ann_idx_rm_hwm_")
    idx = ai.build_ann_index(spark, emb, root, train_iters=0)
    ai.remove_vectors(
        spark, emb.where(F.col("vec_id") == mx).select("vec_id"), idx
    )
    assert idx.max_vec_id(spark) == mx
    with pytest.raises(ValueError, match="high-water mark"):
        ai.append_vectors(spark, emb.where(F.col("vec_id") == mx), idx)
    fresh = emb.where(F.col("vec_id") == mx).withColumn(
        "vec_id", F.col("vec_id") + F.lit(1)
    )
    ai.append_vectors(spark, fresh, idx)
    assert idx.max_vec_id(spark) == mx + 1


def test_remove_vectors_crash_before_meta_is_invisible_then_replays(
    spark, sf_dir
):
    """Crash atomicity, inherited from the meta protocol: a removal
    that commits ``vectors`` but dies before ``codes``/meta leaves
    readers on the old state (meta unmoved), and the re-run completes
    from the PINNED base — the garbage commit above the pin
    contributes nothing, and the end state equals one clean removal."""
    emb = _emb(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ann_idx_rm_crash_")
    idx = ai.build_ann_index(spark, emb, root, train_iters=1)
    pre_v = _rows(idx.vectors.read(spark))
    pre_c = _rows(idx.codes.read(spark))
    rem = emb.where(F.col("vec_id") % 13 == 0).select("vec_id")
    rem_ids = {r[0] for r in rem.collect()}

    real = idx.codes.overwrite_partitions

    def crashing(*a, **kw):
        raise RuntimeError("simulated crash before codes commit")

    idx.codes.overwrite_partitions = crashing
    import pytest

    with pytest.raises(RuntimeError, match="simulated crash"):
        ai.remove_vectors(spark, rem, idx)
    idx.codes.overwrite_partitions = real

    # reader view mid-crash: meta unmoved, full pre content visible
    reader = ai.AnnIndex(root)
    _v, snap = reader.snapshot(spark)
    assert _rows(reader.vectors.read(spark, version=snap["vectors_v"])) == pre_v
    assert _rows(reader.codes.read(spark, version=snap["codes_v"])) == pre_c

    ai.remove_vectors(spark, rem, idx)
    _v, snap2 = idx.snapshot(spark)
    assert _rows(
        idx.vectors.read(spark, version=snap2["vectors_v"])
    ) == [r for r in pre_v if r[0] not in rem_ids]
    assert _rows(
        idx.codes.read(spark, version=snap2["codes_v"])
    ) == [r for r in pre_c if r[0] not in rem_ids]


def test_filtered_search_equals_search_after_removal(spark, sf_dir):
    """The filtered-search exactness cross-pin: removal ≡ filter (pinned
    above), so ann_search(allow=S) on the full index must equal
    ann_search() on a twin index whose complement of S was removed —
    for BOTH the exact and the ADC path, including ranks and scores."""
    emb = _emb(spark, sf_dir)
    allow = emb.where(F.col("vec_id") % 9 != 0).select("vec_id")
    q = _queries(emb)

    full = ai.build_ann_index(
        spark, emb, tempfile.mkdtemp(prefix="ann_filt_a_"), train_iters=1
    )
    twin = ai.build_ann_index(
        spark, emb, tempfile.mkdtemp(prefix="ann_filt_b_"), train_iters=1
    )
    ai.remove_vectors(
        spark, emb.where(F.col("vec_id") % 9 == 0).select("vec_id"), twin
    )

    for search in (ai.ann_search, ai.ann_search_adc):
        got = search(spark, full, q, k=3, n_probes=2, allow=allow)
        want = search(spark, twin, q, k=3, n_probes=2)
        assert _rows(got) == _rows(want), search.__name__
        neighbors = {
            r[0] for r in got.select("neighbor_id").distinct().collect()
        }
        assert all(n % 9 != 0 for n in neighbors)


def test_adc_refine_equals_exact_search_at_full_shortlist(spark, sf_dir):
    """IVFADC + exact re-ranking: with refine ≥ every probed candidate,
    the shortlist is all candidates, so the refined result must be
    bit-identical to ann_search (exact path) — ranks, neighbors, and
    cosines. A small refine stays within the ADC shortlist and returns
    exact scores for what it keeps."""
    emb = _emb(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ann_idx_refine_")
    idx = ai.build_ann_index(spark, emb, root, train_iters=1)
    q = _queries(emb)

    got = ai.ann_search_adc_refined(
        spark, idx, q, k=3, n_probes=2, refine=10**6
    )
    want = ai.ann_search(spark, idx, q, k=3, n_probes=2)
    assert _rows(got) == _rows(want)

    # small refine: every returned (query, neighbor) pair's score is the
    # EXACT cosine (equal to ann_search's score for that same pair)
    small = ai.ann_search_adc_refined(
        spark, idx, q, k=3, n_probes=2, refine=8
    )
    exact_scores = {
        (r[0], r[1]): r[3]
        for r in ai.ann_search(spark, idx, q, k=10**6, n_probes=2).collect()
    }
    for r in small.collect():
        assert exact_scores[(r[0], r[1])] == r[3]


# ------------------------------------------------ cell growth (r12)


def test_grow_cells_zero_iter_equals_from_scratch_build(spark, sf_dir):
    """The exactness anchor (VERDICT r11 item 4): growing a
    zero-iteration index from 8 to 16 cells with 2 training rounds must
    land on BIT-IDENTICAL centroids and assignments to a from-scratch
    build at (n_cells=16, train_iters=2) — the combined seed set IS the
    from-scratch seed set and Lloyd is deterministic integer
    arithmetic, so in-place growth introduces zero drift."""
    emb = _emb(spark, sf_dir)
    grown_root = tempfile.mkdtemp(prefix="ann_grow_")
    fresh_root = tempfile.mkdtemp(prefix="ann_fresh_")
    idx = ai.build_ann_index(spark, emb, grown_root, train_iters=0, n_cells=8)
    ai.grow_ann_cells(spark, idx, 16, train_iters=2)
    fresh = ai.build_ann_index(
        spark, emb, fresh_root, train_iters=2, n_cells=16
    )

    _v, snap = idx.snapshot(spark)
    _fv, fsnap = fresh.snapshot(spark)
    assert ai._n_cells(snap) == 16
    assert int(snap["train_iters"]) == 2
    for t, cols in (
        ("centroids", ["cell", "ce", "cn"]),
        ("vectors", ["vec_id", "cell"]),
        ("codes", ["vec_id", "cell", "codes", "recon_nrm"]),
    ):
        got = getattr(idx, t).read(spark, version=snap[f"{t}_v"]).select(cols)
        want = getattr(fresh, t).read(
            spark, version=fsnap[f"{t}_v"]
        ).select(cols)
        assert _rows(got) == _rows(want), t
    # ... so searches on the grown index ARE the from-scratch searches
    q = _queries(emb)
    assert _rows(ai.ann_search(spark, idx, q, k=3, n_probes=2)) == _rows(
        ai.ann_search(spark, fresh, q, k=3, n_probes=2)
    )


def test_grow_cells_reduces_probe_occupancy(spark, sf_dir):
    """The scale claim the knob exists for: mean candidates scanned per
    1-probe query drops when the cell count quadruples — occupancy is
    now a runtime lever, not a frozen constant."""
    from dbt_jaffleshop_spark.llm.dedup import _quantize_frame
    from dbt_jaffleshop_spark.llm.similarity import _assign_to

    emb = _emb(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ann_occ_")
    idx = ai.build_ann_index(spark, emb, root, train_iters=1, n_cells=8)

    def mean_occupancy():
        _v, snap = idx.snapshot(spark)
        vecs = idx.vectors.read(spark, version=snap["vectors_v"])
        occ = vecs.groupBy("cell").count()
        cents = idx.centroids.read(
            spark, version=snap["centroids_v"]
        ).select("cell", "ce", "cn")
        probes = _assign_to(
            _quantize_frame(_queries(emb)), cents
        ).select("cell")
        return (
            probes.join(occ, "cell")
            .agg(F.avg("count").alias("m"))
            .collect()[0]["m"]
        )

    before = mean_occupancy()
    ai.grow_ann_cells(spark, idx, 32, train_iters=1)
    after = mean_occupancy()
    assert after < before * 0.6, (before, after)


def test_grow_cells_refuses_shrink_and_carries_meta(spark, sf_dir):
    """Only growth is legal (shrinking merges cells — rebuild instead),
    and n_cells rides through append, retrain, removal, and compaction
    like every other piece of index state."""
    import pytest

    from dbt_jaffleshop_spark.llm.dedup_incremental import compact_index

    emb = _emb(spark, sf_dir)
    mx = emb.agg(F.max("vec_id")).collect()[0][0]
    thr = mx * 7 // 10
    root = tempfile.mkdtemp(prefix="ann_meta_")
    idx = ai.build_ann_index(
        spark, emb.where(F.col("vec_id") <= thr), root,
        train_iters=0, n_cells=8,
    )
    with pytest.raises(ValueError, match="GROW"):
        ai.grow_ann_cells(spark, idx, 8)
    with pytest.raises(ValueError, match="GROW"):
        ai.grow_ann_cells(spark, idx, 4)
    ai.grow_ann_cells(spark, idx, 16)
    ai.append_vectors(spark, emb.where(F.col("vec_id") > thr), idx)
    ai.retrain_ann_index(spark, idx, train_iters=1)
    ai.remove_vectors(
        spark, emb.where(F.col("vec_id") % 7 == 3).select("vec_id"), idx
    )
    compact_index(spark, idx)
    assert ai._n_cells(idx.snapshot(spark)[1]) == 16


def test_grow_cells_refuses_negative_training(spark, sf_dir):
    """r12 review: range(-k) would silently skip training while the
    cumulative train_iters bookkeeping absorbed the negative value."""
    import pytest

    emb = _emb(spark, sf_dir)
    root = tempfile.mkdtemp(prefix="ann_neg_")
    idx = ai.build_ann_index(spark, emb, root, train_iters=0, n_cells=8)
    with pytest.raises(ValueError, match="train_iters"):
        ai.grow_ann_cells(spark, idx, 16, train_iters=-2)
