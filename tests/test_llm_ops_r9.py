"""Round-9 operator tests: the star-reduced LSH candidates wired as
the PRODUCTION input of clustering-bound dedup (llm/dedup.py — VERDICT
r8 item 1), for both the document (MinHash) and embedding
(hyperplane-LSH) corpora."""

from __future__ import annotations

from conftest import assert_parity


def _components(pairs):
    """Tiny union-find over collected (a, b) pairs."""
    parent = {}

    def find(u):
        parent.setdefault(u, u)
        while parent[u] != u:
            parent[u] = parent[parent[u]]
            u = parent[u]
        return u

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {u: find(u) for u in parent}


def test_production_star_pairs_match_library_generator(spark, sf_dir):
    """dedup_minhash_star_pairs (the cached-shingle production path that
    dedup_clusters consumes) must be row-identical to the r8 library
    generator minhash_star_pairs_over on the same corpus — same
    banding, same star reduction, same verification."""
    from dbt_jaffleshop_spark.llm import dedup as dd
    from dbt_jaffleshop_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir)
    prod = sorted(
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in dd.dedup_minhash_star_pairs(spark, sf_dir).collect()
    )
    lib = sorted(
        (r.doc_a, r.doc_b, round(r.jaccard, 9))
        for r in dd.minhash_star_pairs_over(docs).collect()
    )
    assert prod == lib
    assert prod, "planted near-dups must produce star edges"


def test_dedup_clusters_star_input_component_identical_to_all_pairs(
    spark, sf_dir
):
    """The r9 wiring contract (VERDICT r8 item 1): the production
    dedup_clusters — now fed by star-reduced candidates — must assign
    the identical (doc_id, cluster_id, cluster_size) rows as connected
    components over the ALL-PAIRS verified relation."""
    from dbt_jaffleshop_spark.llm import dedup as dd

    star_rows = sorted(map(tuple, dd.dedup_clusters(spark, sf_dir).collect()))
    allp = [
        (r.doc_a, r.doc_b)
        for r in dd.dedup_minhash_pairs(spark, sf_dir).collect()
    ]
    comp = _components(allp)
    sizes: dict[int, int] = {}
    for root in comp.values():
        sizes[root] = sizes.get(root, 0) + 1
    expected = sorted((n, comp[n], sizes[comp[n]]) for n in comp)
    assert star_rows == expected


def test_emb_clusters_star_matches_recursive_cte_oracle(spark, oracle, sf_dir):
    """The embedding twin digest member verified directly against its
    independent DuckDB recursive-CTE reachability oracle (the driver's
    sim_eval_digest check, run row-for-row here)."""
    from dbt_jaffleshop_spark.llm import dedup as dd

    df = dd.emb_clusters_star(spark, sf_dir)
    assert_parity(df, oracle, dd.ORACLES["emb_clusters_star"])


def test_emb_clusters_star_component_identical_to_all_pairs_lsh(spark):
    """Embedding star clustering must keep the all-pairs LSH relation's
    connected components (same contract as the document twin). sf0.01:
    the sf0.001 slice has no cosine-near-dup embeddings at all, which
    would make this vacuously green."""
    from dbt_jaffleshop_spark.llm import dedup as dd

    sf = "/root/testdata/sf0.01"
    rows = sorted(
        (r.vec_id, r.cluster_id, r.cluster_size)
        for r in dd.emb_clusters_star(spark, sf).collect()
    )
    allp = [
        (r.id_a, r.id_b)
        for r in dd.dedup_embedding_lsh(spark, sf).collect()
    ]
    comp = _components(allp)
    sizes: dict[int, int] = {}
    for root in comp.values():
        sizes[root] = sizes.get(root, 0) + 1
    expected = sorted((n, comp[n], sizes[comp[n]]) for n in comp)
    assert rows == expected
    assert rows, "planted near-dup embeddings must cluster"


def test_emb_hybrid_mega_bucket_linear_star_edges(spark):
    """Above EMB_STAR_BUCKET_CAP a band bucket switches to star
    candidates: a planted mega-bucket of N identical embeddings (ids
    0..N-1, so the bucket min is a duplicate) plus random chaff yields
    exactly N-1 verified edges — linear, not N(N-1)/2 — and one
    N-sized cluster."""
    import numpy as np

    from dbt_jaffleshop_spark.llm import dedup as dd
    from pyspark.sql import functions as F

    rng = np.random.default_rng(7)
    base = (rng.integers(-50, 50, 64) * 1000).tolist()
    n = 20
    rows = [(i, base) for i in range(n)]
    rows += [
        (100 + i, (rng.integers(-50000, 50000, 64)).tolist()) for i in range(6)
    ]
    q = spark.createDataFrame(
        rows, "vec_id long, e array<long>"
    ).withColumn("nrm", F.expr("aggregate(e, 0L, (acc, x) -> acc + x * x)"))

    cap = 8  # force the mega-bucket branch at toy scale
    pairs = dd._verify_cosine(dd._emb_hybrid_candidates(q, cap=cap), q)
    got = [(r.id_a, r.id_b) for r in pairs.collect()]
    dup_edges = [(a, b) for a, b in got if a < n and b < n]
    assert len(dup_edges) == n - 1  # star, not clique
    clusters = {
        r.doc_id: r
        for r in dd._star_components(
            pairs.select(
                F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
            )
        ).collect()
    }
    assert all(clusters[i].cluster_id == 0 for i in range(n))
    assert clusters[0].cluster_size >= n


def test_dedup_clusters_mega_bucket_linear_candidates(spark):
    """On a planted mega-bucket corpus (one text duplicated N times)
    the production clustering input generates exactly N-1 verified
    edges (star), and dedup_clusters still assigns one N-sized
    cluster — the 100 TB mega-bucket behavior, end to end."""
    from dbt_jaffleshop_spark.llm import dedup as dd

    n = 40
    rows = [(i, "the same exact duplicated document text " * 4) for i in range(n)]
    rows += [
        (100 + i, f"completely unrelated chaff text number {i} " * 3)
        for i in range(5)
    ]
    planted = spark.createDataFrame(rows, "doc_id long, text string")
    star = dd.minhash_star_pairs_over(planted)
    assert star.count() == n - 1
    clusters = {r.doc_id: r for r in dd._star_components(star).collect()}
    assert all(clusters[i].cluster_id == 0 for i in range(n))
    assert clusters[0].cluster_size == n


def test_bucket_cap_drops_mega_bucket_keeps_small(spark, tmp_path):
    """The opt-in bucket_cap on dedup_minhash_pairs (VERDICT r8 item 5):
    a planted mega-bucket (N duplicates, N > cap) contributes ZERO
    pairs while a small duplicate family below the cap keeps its pairs;
    with the cap off (default) the mega-bucket emits all N(N-1)/2."""
    from dbt_jaffleshop_spark.llm import dedup as dd
    from dbt_jaffleshop_spark.models.base import release_cached

    n = 12
    rows = [(i, "the same exact duplicated document text " * 4) for i in range(n)]
    rows += [(200, "a small duplicate family shared text body " * 4),
             (201, "a small duplicate family shared text body " * 4)]
    sf = str(tmp_path / "sfcap")
    (tmp_path / "sfcap").mkdir()
    docs = spark.createDataFrame(rows, "doc_id long, text string").selectExpr(
        "doc_id", "text", "'en' AS lang", "'web' AS source",
        "length(text) AS n_chars",
    )
    docs.coalesce(1).write.parquet(
        str(tmp_path / "sfcap" / "documents.parquet")
    )

    release_cached(spark)
    capped = [(r.doc_a, r.doc_b)
              for r in dd.dedup_minhash_pairs(spark, sf, bucket_cap=8).collect()]
    assert capped == [(200, 201)]  # mega-bucket dropped, small family kept

    release_cached(spark)
    full = dd.dedup_minhash_pairs(spark, sf).count()
    assert full == n * (n - 1) // 2 + 1
    release_cached(spark)


def test_bucket_cap_embedding_lsh(spark):
    """The opt-in bucket_cap on dedup_embedding_lsh: a cap below the
    corpus bucket sizes suppresses every candidate (all sf0.01 buckets
    are ~31 vectors); a cap above them is identical to the default."""
    from dbt_jaffleshop_spark.llm import dedup as dd

    sf = "/root/testdata/sf0.01"
    assert dd.dedup_embedding_lsh(spark, sf, bucket_cap=5).count() == 0
    base = sorted(
        (r.id_a, r.id_b) for r in dd.dedup_embedding_lsh(spark, sf).collect()
    )
    high = sorted(
        (r.id_a, r.id_b)
        for r in dd.dedup_embedding_lsh(spark, sf, bucket_cap=10**6).collect()
    )
    assert base == high and base  # cap off the critical path changes nothing


def test_gif_truncated_gce_raises_value_error():
    """Corrupt-input contract (advisor r8): a Graphic Control Extension
    with a declared length < 4, or one that runs past the payload end,
    must raise the decoder's ValueError — not IndexError."""
    import numpy as np
    import pytest

    from dbt_jaffleshop_spark.llm.multimodal import (
        gif_decode_rgb,
        gif_encode_animation,
    )

    gray = bytes(bytearray(v for i in range(256) for v in (i, i, i)))
    frame = np.full((4, 5), 7, np.uint8)
    good = gif_encode_animation(5, 4, gray, 0, [{"px": frame, "disposal": 1}])
    at = good.find(b"\x21\xf9\x04")
    assert at >= 0, "encoder must emit a GCE"

    short_decl = bytearray(good)
    short_decl[at + 2] = 2  # declared GCE body of 2 bytes
    with pytest.raises(ValueError, match="GCE"):
        gif_decode_rgb(bytes(short_decl))

    cut = good[: at + 4]  # payload ends inside the GCE body
    with pytest.raises(ValueError, match="GCE"):
        gif_decode_rgb(cut)


def test_write_bucketed_rejects_non_identifier(spark):
    """write_bucketed interpolates table_name into a DROP statement —
    anything but a plain [db.]identifier must be refused up front
    (advisor r8)."""
    import pytest

    from dbt_jaffleshop_spark.functions.bucketing import write_bucketed

    df = spark.range(3)
    for bad in ("t; DROP TABLE x", "a-b", "`quoted`", "a.b.c", ""):
        with pytest.raises(ValueError, match="identifier"):
            write_bucketed(df, bad, "id")


def test_png_alpha_and_subbyte_roundtrips():
    """r9 PNG closure: gray+alpha (color 4), RGBA (color 6) at 8 and 16
    bits, and sub-byte grayscale/palette depths (1/2/4) — every
    combination roundtrips bit-for-bit through the independent
    encoder/decoder pair, sequential AND Adam7-interlaced."""
    import numpy as np

    from dbt_jaffleshop_spark.llm.multimodal import (
        png_decode,
        png_encode,
        png_encode_palette,
    )

    rng = np.random.default_rng(11)
    for h, w in ((1, 1), (4, 4), (7, 9), (16, 5)):
        for ch in (2, 4):  # gray+alpha, RGBA
            for dtype, depth in ((np.uint8, 8), (np.uint16, 16)):
                px = rng.integers(
                    0, 1 << depth, (h, w, ch), dtype=np.uint32
                ).astype(dtype)
                for inter in (False, True):
                    out = png_decode(png_encode(px, interlace=inter))
                    assert out.shape == (h, w, ch), (ch, depth, inter)
                    assert out.dtype == dtype
                    assert (out == px).all(), (h, w, ch, depth, inter)
        for depth in (1, 2, 4):
            px = rng.integers(0, 1 << depth, (h, w)).astype(np.uint8)
            for inter in (False, True):
                out = png_decode(png_encode(px, interlace=inter, depth=depth))
                assert out.shape == (h, w) and (out == px).all(), (depth, inter)
            # sub-byte palette indices resolve through PLTE
            pal = rng.integers(0, 256, (1 << depth, 3)).astype(np.uint8)
            for inter in (False, True):
                out = png_decode(
                    png_encode_palette(px, pal, interlace=inter, depth=depth)
                )
                assert out.shape == (h, w, 3)
                assert (out == pal[px]).all(), (depth, inter)


def test_png_subbyte_rejects_out_of_range_and_bad_shapes():
    """Sub-byte encode guards: samples must fit the depth, sub-byte is
    grayscale-only, and an illegal IHDR combination is ValueError."""
    import numpy as np
    import pytest

    from dbt_jaffleshop_spark.llm.multimodal import png_encode

    with pytest.raises(ValueError, match="out of range"):
        png_encode(np.full((2, 2), 4, np.uint8), depth=2)
    with pytest.raises(ValueError, match="grayscale-only"):
        png_encode(np.zeros((2, 2, 3), np.uint8), depth=4)


def test_components_hybrid_paths_identical(spark):
    """r9 CC hybrid: the single-task union-find fast path and the
    distributed star iteration must emit IDENTICAL (doc_id, cluster_id,
    cluster_size) labelings — cluster_id = component-min node — on the
    same graphs. Cutoff forced to both extremes so each path runs
    regardless of the default SMALL_GRAPH_EDGE_CUTOFF."""
    import random

    from dbt_jaffleshop_spark.llm import dedup as dd

    rng = random.Random(9)
    graphs = [
        # long chain + star + isolated pair (the r8 pinned shape)
        [(i, i + 1) for i in range(100, 164)]
        + [(500, 500 + k) for k in range(1, 9)]
        + [(900, 901)],
        # random sparse graph
        sorted({tuple(sorted(rng.sample(range(60), 2))) for _ in range(80)}),
        # two dense blobs bridged by one edge
        [(a, b) for a in range(0, 12) for b in range(a + 1, 12)]
        + [(a, b) for a in range(20, 30) for b in range(a + 1, 30)]
        + [(11, 20)],
    ]
    for pairs in graphs:
        pair_df = spark.createDataFrame(
            [(int(a), int(b)) for a, b in pairs], "doc_a long, doc_b long"
        )
        fast = sorted(
            (r.doc_id, r.cluster_id, r.cluster_size)
            for r in dd._star_components(pair_df, small_cutoff=10**9).collect()
        )
        star = sorted(
            (r.doc_id, r.cluster_id, r.cluster_size)
            for r in dd._star_components(pair_df, small_cutoff=0).collect()
        )
        assert fast == star
        assert fast  # non-empty


def test_components_default_cutoff_routes_small_graph_fast(spark):
    """The default cutoff must send a bench-scale graph down the
    single-task path: its physical plan contains the Arrow map operator
    and NO star-iteration artifacts, and the star path is only engaged
    above SMALL_GRAPH_EDGE_CUTOFF edges."""
    from dbt_jaffleshop_spark.llm import dedup as dd

    pair_df = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 50)], "doc_a long, doc_b long"
    )
    out = dd._star_components(pair_df)  # default cutoff
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan
    assert dd.SMALL_GRAPH_EDGE_CUTOFF >= 1_000_000  # stays a scale gate
