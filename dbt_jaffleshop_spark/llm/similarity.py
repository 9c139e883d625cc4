"""Similarity search over the `embeddings` table (beyond-reference
extension; BASELINE.json north star: "similarity search").

Two operators:

* sim_topk_cosine — brute-force exact top-k (the correctness baseline).
  Query rows broadcast against the candidate corpus; rank is a window
  partitioned per query (no global window — scales with #queries).
* sim_lsh_topk   — random-hyperplane LSH-bucketed approximate top-k (the
  100 TB path): 8 fixed ±1 hyperplanes → 8 sign bits → bucket id; the
  candidate join touches only same-bucket pairs (corpus/256 per bucket in
  expectation), turning an O(Q·N) scan into a bucket-colocated join.

All dot products are integer-exact (common.py quantization), cosine is a
fixed IEEE chain — the DuckDB oracles run the identical algorithm, so
even the *approximate* operator has exact result parity.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .common import EMB_SCALE, SIM_LSH_PLANES
from .dedup import _COS, _COS_D, _QUANT_CTE, _quantized_embeddings

TOP_K = 5
LSH_TOP_K = 3
QUERY_STRIDE = 50  # vec_id % 50 == 0 → 10 queries at sf0.01, 40 at sf0.1


def sim_topk_cosine(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Exact cosine top-k for each query vector (vec_id ≡ 0 mod 50),
    deterministic tie-break on neighbor id."""
    q = _quantized_embeddings(spark, sf_dir)
    queries = q.where(F.col("vec_id") % QUERY_STRIDE == 0)
    scored = (
        F.broadcast(queries.alias("q"))
        .join(q.alias("c"), F.col("q.vec_id") != F.col("c.vec_id"))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.expr(
                "aggregate(zip_with(q.e, c.e, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
            ).alias("dot"),
            F.col("q.nrm").alias("na"),
            F.col("c.nrm").alias("nb"),
        )
        .withColumn("cos_sim", F.expr(_COS))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TOP_K)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def _bucket_expr(e_col: str) -> str:
    """8 sign bits of integer hyperplane dot products → bucket id."""
    terms = []
    for j, plane in enumerate(SIM_LSH_PLANES):
        arr = ", ".join(f"{v}L" for v in plane)
        dot = (
            f"aggregate(zip_with({e_col}, array({arr}),"
            f" (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
        )
        terms.append(f"(case when {dot} > 0 then {1 << j} else 0 end)")
    return " + ".join(terms)


def sim_lsh_topk(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Approximate top-k: candidates restricted to the query's LSH bucket.
    Same output shape as sim_topk_cosine; recall < 1 by design — the
    bucket join is what survives a 1000-executor scale-up."""
    q = _quantized_embeddings(spark, sf_dir).withColumn(
        "bucket", F.expr(_bucket_expr("e"))
    )
    queries = q.where(F.col("vec_id") % QUERY_STRIDE == 0)
    scored = (
        F.broadcast(
            queries.select(
                F.col("vec_id").alias("query_id"),
                F.col("e").alias("qe"),
                F.col("nrm").alias("na"),
                F.col("bucket"),
            )
        )
        .join(q.alias("c"), "bucket")
        .where(F.col("query_id") != F.col("c.vec_id"))
        .select(
            "query_id",
            F.col("c.vec_id").alias("neighbor_id"),
            F.expr(
                "aggregate(zip_with(qe, c.e, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
            ).alias("dot"),
            F.col("na"),
            F.col("c.nrm").alias("nb"),
        )
        .withColumn("cos_sim", F.expr(_COS))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= LSH_TOP_K)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


N_CELLS = 16
IVF_TOP_K = 3


def _assign_cells(q: DataFrame, n_probes: int = 1) -> DataFrame:
    """The IVF coarse quantizer's E-step against the 16 SEED centroids
    (the embeddings of vec_ids 0..15) — shared by the search paths
    (sim_ivf_topk, sim_ivf_probe2_topk) and the first training step
    (emb_kmeans_iter). ``n_probes > 1`` keeps each vector's top-N cells
    (multi-probe query expansion) instead of only the argmax — still
    map-side, the row count just multiplies by N."""
    cents = q.where(F.col("vec_id") < N_CELLS).select(
        F.col("vec_id").alias("cell"),
        F.col("e").alias("ce"),
        F.col("nrm").alias("cn"),
    )
    return _assign_to(q, cents, n_probes)


def _assign_to(q: DataFrame, cents: DataFrame, n_probes: int = 1) -> DataFrame:
    """Assignment against an ARBITRARY (cell, ce, cn) centroid table —
    broadcast (≤ N_CELLS rows), map-side integer-cosine argmax with a
    deterministic cell tie-break. Taking the centroid table as input is
    what makes Lloyd's loop composable: iteration k+1 assigns against
    iteration k's means (emb_kmeans_iter2)."""
    assign_w = Window.partitionBy("vec_id").orderBy(
        F.desc("c_cos"), F.asc("cell")
    )
    return (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "dot",
            F.expr("aggregate(zip_with(e, ce, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"),
        )
        .withColumn("na", F.col("nrm"))
        .withColumn("nb", F.col("cn"))
        .withColumn("c_cos", F.expr(_COS))
        .withColumn("rn", F.row_number().over(assign_w))
        .where(F.col("rn") <= n_probes)
        # rn (= probe rank) is kept so multi-probe callers can split one
        # shared assignment into corpus (rn=1) and probe (rn<=N) views —
        # identical subtrees below the filters let AQE reuse the rank
        # window's exchange instead of re-running the E-step
        .select("vec_id", "e", "nrm", "cell", "rn")
    )


def sim_ivf_topk(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """IVF-style approximate top-k: a coarse quantizer assigns every
    vector to its nearest of 16 fixed centroids (the embeddings of
    vec_ids 0..15 — a deterministic stand-in for trained k-means cells);
    queries probe only their own cell (nprobe=1).

    Scale shape: the centroid table is broadcast (16 rows); assignment is
    a map-side argmax, and the candidate join shuffles on cell id — cells
    are corpus/16 in expectation, so per-query work drops accordingly.
    Exact integer cosine throughout ⇒ the DuckDB oracle (same algorithm)
    matches bit-for-bit."""
    assigned = _assign_cells(_quantized_embeddings(spark, sf_dir))
    queries = assigned.where(F.col("vec_id") % QUERY_STRIDE == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("e").alias("qe"),
        F.col("nrm").alias("qn"),
        "cell",
    )
    scored = (
        queries.join(assigned.alias("c"), "cell")
        .where(F.col("query_id") != F.col("c.vec_id"))
        .select(
            "query_id",
            F.col("c.vec_id").alias("neighbor_id"),
            F.expr(
                "aggregate(zip_with(qe, c.e, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
            ).alias("dot"),
            F.col("qn").alias("na"),
            F.col("c.nrm").alias("nb"),
        )
        .withColumn("cos_sim", F.expr(_COS))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= IVF_TOP_K)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


IVF_NPROBE = 2


def sim_ivf_probe2_topk(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Multi-probe IVF top-k (r6): queries probe their TWO nearest
    cells instead of one — the standard recall/cost knob of an IVF
    index (FAISS's nprobe). Candidate sets from the two probed cells
    are disjoint by construction (corpus vectors hold exactly one
    rn=1 cell), so no dedup stage is needed; expected candidate work
    is 2·corpus/16 per query vs nprobe=1's corpus/16, buying recall on
    queries that fall near a cell boundary — the dominant failure mode
    of single-probe search. Recall(probe2) ≥ recall(probe1) is
    pytest-pinned per query.

    Scale shape: ONE shared broadcast-16 map-side assignment pass at
    n_probes=2, split by probe rank into the corpus view (rn=1) and the
    query view (rn≤2) — the two join sides filter the SAME subtree, so
    AQE reuses the rank window's exchange instead of re-running the
    E-step; the candidate join shuffles on cell id exactly like
    sim_ivf_topk. rank is emitted as bigint (digest-stable across
    engines)."""
    assigned = _assign_cells(
        _quantized_embeddings(spark, sf_dir), n_probes=IVF_NPROBE
    )
    corpus = assigned.where(F.col("rn") == 1).select("vec_id", "e", "nrm", "cell")
    queries = (
        assigned.where(F.col("vec_id") % QUERY_STRIDE == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("nrm").alias("qn"),
            "cell",
        )
    )
    scored = (
        queries.join(corpus.alias("c"), "cell")
        .where(F.col("query_id") != F.col("c.vec_id"))
        .select(
            "query_id",
            F.col("c.vec_id").alias("neighbor_id"),
            F.expr(
                "aggregate(zip_with(qe, c.e, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
            ).alias("dot"),
            F.col("qn").alias("na"),
            F.col("c.nrm").alias("nb"),
        )
        .withColumn("cos_sim", F.expr(_COS))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= IVF_TOP_K)
        .select("query_id", "neighbor_id", "rank", "cos_sim")
    )


def emb_kmeans_iter(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """One Lloyd iteration of the IVF coarse quantizer's k-means (r5) —
    the TRAINING step the fixed seed centroids stand in for. E-step:
    the shared `_assign_cells` assignment (broadcast 16 seeds, map-side
    integer-cosine argmax). M-step: per (cell, dimension) coordinate
    sums and integer-division means over the micro-quantized int64
    embeddings — the new centroid table, integer-exact in both engines
    (Spark `div` and DuckDB `//` both truncate toward zero — verified
    on negative sums, which this table has plenty of).

    Plan shape for 100 TB: assignment is map-side (broadcast ×16, no
    shuffle), posexplode fans each vector into 64 (cell, dim) rows that
    partial-aggregate BEFORE the one shuffle onto ≤ cells×dims = 1024
    keys — the classic distributed-k-means reduce. Iterating = re-run
    with the output as the next centroid table (emb_kmeans_iter2 DOES
    exactly that under driver verification)."""
    assigned = _assign_cells(_quantized_embeddings(spark, sf_dir))
    return _m_step(assigned)


def _m_step(assigned: DataFrame) -> DataFrame:
    """Lloyd M-step: per-(cell, dim) integer coordinate sums and
    floor-div means over the assigned vectors."""
    coords = assigned.select(
        "cell", F.posexplode("e").alias("dim", "coord")
    )
    return (
        coords.groupBy("cell", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.sum("coord").alias("sum_coord"),
        )
        .select(
            "cell",
            F.col("dim").cast("bigint").alias("dim"),
            "n_members",
            "sum_coord",
            F.expr("sum_coord div n_members").alias("mean_coord"),
        )
    )


def centroids_from_means(means: DataFrame) -> DataFrame:
    """Pivot an M-step's per-(cell, dim) means back into a ≤N_CELLS-row
    (cell, ce, cn) centroid table — array re-assembled in dim order,
    integer squared norm recomputed. The glue that makes Lloyd's loop
    compose (iteration k+1 assigns against THIS); shared by
    emb_kmeans_iter2 and the persisted ANN index's training loop
    (llm/ann_index.py)."""
    return (
        means.groupBy("cell")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("dim", "mean_coord"))
            ).alias("pairs")
        )
        .select(
            "cell",
            F.expr("transform(pairs, p -> p.mean_coord)").alias("ce"),
        )
        .withColumn("cn", F.expr("aggregate(ce, 0L, (acc, x) -> acc + x * x)"))
    )


def emb_kmeans_iter2(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """The SECOND Lloyd iteration (r6) — proves the loop composes:
    iteration 1's per-(cell, dim) means pivot back into a ≤16-row
    centroid table (array re-assembled in dim order, integer squared
    norm recomputed), every vector re-assigns against THOSE centroids
    through the same broadcast E-step, and the M-step re-runs. Each row
    also carries ``shift_abs`` = |mean₂ − mean₁| for its coordinate —
    the convergence signal a training loop stops on. A cell that loses
    all members in round 2 disappears from the output (both engines).

    Plan shape: identical per-iteration cost to emb_kmeans_iter — the
    centroid pivot is a 1024-row aggregation, the re-assignment is the
    same map-side broadcast, the M-step the same ≤1024-key shuffle —
    which is the point: k-means at 100 TB is THIS, k times."""
    base = _quantized_embeddings(spark, sf_dir)
    means1 = emb_kmeans_iter(spark, sf_dir)
    cents2 = centroids_from_means(means1)
    means2 = _m_step(_assign_to(base, cents2))
    return (
        means2.join(
            means1.select(
                "cell", "dim", F.col("mean_coord").alias("prev_mean")
            ),
            ["cell", "dim"],
        )
        .select(
            "cell",
            "dim",
            "n_members",
            "sum_coord",
            "mean_coord",
            F.expr("abs(mean_coord - prev_mean)").alias("shift_abs"),
        )
    )


# --------------------------------------------------- IVF-PQ (ADC) search

PQ_M = 8      # subspaces (64 dims / 8)
PQ_DSUB = 8   # dims per subspace
PQ_K = N_CELLS  # 16 codewords per subspace: the seed vectors 0..15


def _pq_codebook(q: DataFrame) -> DataFrame:
    """The PQ codebook: subvectors of the 16 seed embeddings — the same
    deterministic stand-in for trained centroids the IVF coarse
    quantizer uses, so both quantization levels share one convention.
    Carries each codeword's per-subspace squared norm for the
    reconstructed-norm term."""
    subn = (
        f"transform(sequence(0, {PQ_M - 1}), m -> aggregate("
        f"slice(cbe, m * {PQ_DSUB} + 1, {PQ_DSUB}),"
        " 0L, (acc, x) -> acc + x * x))"
    )
    return q.where(F.col("vec_id") < PQ_K).select(
        F.col("vec_id").alias("j"),
        F.col("e").alias("cbe"),
    ).withColumn("subn", F.expr(subn))


def _pq_encode(vecs: DataFrame, cb: DataFrame) -> DataFrame:
    """PQ-encode a (vec_id, e, cell, …) frame against a (j, cbe, subn)
    codebook → (vec_id, cell, codes, recon_nrm): each of the M
    subvectors assigned to its nearest codeword by exact integer
    squared L2 (broadcast codebook; ONE shuffle on vec_id), the chosen
    codewords' subnorms summed into the reconstructed norm. Shared by
    sim_ivfpq_topk and the persisted ANN index's codes table
    (llm/ann_index.py) — both quantize identically by construction."""
    subd = (
        f"transform(sequence(0, {PQ_M - 1}), m -> aggregate("
        f"zip_with(slice(e, m * {PQ_DSUB} + 1, {PQ_DSUB}),"
        f" slice(cbe, m * {PQ_DSUB} + 1, {PQ_DSUB}),"
        " (x, y) -> (x - y) * (x - y)), 0L, (acc, x) -> acc + x))"
    )
    sel = (
        f"transform(sequence(0, {PQ_M - 1}), m -> aggregate(pairs,"
        " named_struct('d', 9223372036854775807L, 'c', -1L, 'n', 0L),"
        " (acc, p) -> IF(p.subd[m] < acc.d,"
        " named_struct('d', p.subd[m], 'c', p.j, 'n', p.subn[m]), acc)))"
    )
    return (
        vecs.crossJoin(F.broadcast(cb))
        .withColumn("subd", F.expr(subd))
        .groupBy("vec_id")
        .agg(
            F.first("cell").alias("cell"),
            F.expr("array_sort(collect_list(struct(j, subd, subn)))").alias(
                "pairs"
            ),
        )
        .withColumn("sel", F.expr(sel))
        .select(
            "vec_id",
            "cell",
            F.expr("transform(sel, s -> s.c)").alias("codes"),
            F.expr(
                "greatest(aggregate(sel, 0L, (acc, s) -> acc + s.n), 1L)"
            ).alias("recon_nrm"),
        )
    )


def sim_ivfpq_topk(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """FAISS-style IVFADC (r7): IVF cell restriction + product-quantized
    codes + per-query asymmetric-distance lookup tables.

    This is the actual 100 TB ANN memory story: the corpus is stored as
    M=8 codes of 4 bits (plus a cell id) instead of 64 floats — codes
    ≪ vectors — and search never touches the original embeddings:

    * **Encode** (index build, one-time): each vector's 8 subvectors are
      assigned to the nearest of 16 codewords by exact integer squared
      L2 (broadcast 16-row codebook → per-vector fold over the collected
      16 candidates; ONE shuffle on vec_id, then everything is per-row).
      The chosen codewords' subnorms sum to the reconstructed norm.
    * **Search** (the hot path): each query precomputes an 8x16 LUT of
      integer subvector dot products against the broadcast codebook —
      after that, scoring a candidate is 8 array lookups + adds
      (`adot = sum_m LUT[m][code_m]`), never a 64-dim dot. Candidates
      come only from the query's IVF cell (nprobe=1, the shared
      `_assign_cells` E-step). Ranking by `adot / (sqrt(|q|)·sqrt(|x̂|))`
      — asymmetric cosine against the RECONSTRUCTION, the ADC quantity.

    Integer-exact end to end (dots, distances, norms all int64; one
    final float division chain), so the DuckDB oracle (IVFPQ_ORACLE)
    replays it bit-for-bit — rare for an ANN index, and exactly why the
    codebook is deterministic. Zero-reconstruction guard: greatest(.,1)
    keeps the division well-defined; pairs fold ties break to the
    lowest codeword id (array_sort by j + strict <)."""
    q = _quantized_embeddings(spark, sf_dir)
    assigned = _assign_cells(q)
    cb = _pq_codebook(q)
    enc = _pq_encode(assigned, cb)

    subdot = (
        f"transform(sequence(0, {PQ_M - 1}), m -> aggregate("
        f"zip_with(slice(qe, m * {PQ_DSUB} + 1, {PQ_DSUB}),"
        f" slice(cbe, m * {PQ_DSUB} + 1, {PQ_DSUB}),"
        " (x, y) -> x * y), 0L, (acc, x) -> acc + x))"
    )
    lutq = (
        assigned.where(F.col("vec_id") % QUERY_STRIDE == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("e").alias("qe"),
            F.col("nrm").alias("qn"),
            "cell",
        )
        .crossJoin(F.broadcast(cb))
        .withColumn("sd", F.expr(subdot))
        .groupBy("query_id")
        .agg(
            F.first("qn").alias("na"),
            F.first("cell").alias("cell"),
            F.expr("array_sort(collect_list(struct(j, sd)))").alias("lut"),
        )
    )
    adot = (
        f"aggregate(sequence(0, {PQ_M - 1}), 0L, (acc, m) -> "
        "acc + lut[cast(codes[m] as int)].sd[m])"
    )
    scored = (
        lutq.join(enc, "cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(adot).alias("dot"),
            "na",
            F.col("recon_nrm").alias("nb"),
        )
        .withColumn("adc_sim", F.expr(_COS))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("adc_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= IVF_TOP_K)
        .select("query_id", "neighbor_id", "rank", "adc_sim")
    )


# ------------------------------------------------------------- oracle SQL


def _bucket_expr_duck() -> str:
    terms = []
    for j, plane in enumerate(SIM_LSH_PLANES):
        arr = ", ".join(str(v) for v in plane)
        dot = (
            f"CAST(list_sum(list_transform(list_zip(e, [{arr}]),"
            f" pr -> pr[1] * pr[2])) AS BIGINT)"
        )
        terms.append(f"(CASE WHEN {dot} > 0 THEN {1 << j} ELSE 0 END)")
    return " + ".join(terms)


# ----------------------------------------------------- ANN recall@k eval


def sim_recall_at_k(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Per-query recall@3 of the LSH-bucketed ANN path against the exact
    top-3 — THE quality metric for an approximate index (what fraction of
    the true nearest neighbors the bucketed search retrieves). Pure
    composition of the two existing operators, each subplan evaluated
    ONCE: the approximate list is left-joined to the exact list's hit
    marker and a single per-query aggregation yields both the retrieved
    and hit counts (Catalyst does not dedupe repeated subplans, so
    referencing `approx`/`exact` twice would re-run the corpus-sized
    scoring joins); the query base comes from a cheap embeddings scan,
    not a recompute of the exact plan. Deterministic end-to-end, so the
    DuckDB oracle — the same composition of the same two oracle
    queries — matches bit-for-bit. Driver-verified as a member of
    `sim_eval_digest` (queries/op_digests.py) since round 4b, in
    addition to the RECALL_ORACLE pytest.

    Expected reading on THIS corpus: ≈ 0. The synthetic embeddings are
    near-isotropic, so a true top-3 neighbor of a random query shares
    its single 8-sign-bit bucket with probability ≈ (1/2)^8 — the eval
    correctly quantifies why nprobe=1 single-bucket search needs banded
    multi-bucket union (dedup_embedding_lsh's shape) or clustered data
    to achieve recall; the measurement machinery, not a high score, is
    what this operator contributes."""
    from ..sources import load_table

    exact = sim_topk_cosine(spark, sf_dir).where(F.col("rank") <= LSH_TOP_K)
    approx = sim_lsh_topk(spark, sf_dir)
    per_query = (
        approx.join(
            exact.select("query_id", "neighbor_id", F.lit(1).alias("hit")),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(
            F.count(F.lit(1)).alias("n_retrieved"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hits"),
        )
    )
    # the query universe is structural (the stride sample), so a cheap
    # embeddings scan — NOT a second evaluation of the exact plan —
    # restores queries whose bucket retrieved nothing
    base = (
        load_table(spark, "embeddings", sf_dir)
        .where(F.col("vec_id") % QUERY_STRIDE == 0)
        .select(F.col("vec_id").alias("query_id"))
    )
    return (
        base.join(per_query, "query_id", "left")
        .select(
            "query_id",
            F.coalesce(F.col("n_retrieved"), F.lit(0).cast("bigint")).alias(
                "n_retrieved"
            ),
            F.coalesce(F.col("n_hits"), F.lit(0).cast("bigint")).alias(
                "n_hits"
            ),
            (
                F.coalesce(F.col("n_hits"), F.lit(0)).cast("double")
                / F.lit(float(LSH_TOP_K))
            ).alias("recall_at_k"),
        )
    )


# ------------------------------------------------ kNN label classification

KNN_K = 5


def sim_knn_classify(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """k-nearest-neighbor label prediction for the held-out eval rows
    (vec_id ≡ 0 mod QUERY_STRIDE): the `label` column's majority among
    the 5 nearest TRAIN vectors by exact integer cosine — the standard
    embedding-quality eval (does neighborhood structure recover labels).

    Fully deterministic: integer dot products, neighbor ties break on
    vec_id, vote ties on (votes desc, label asc). Brute-force is the
    correctness baseline, sized for eval sets (queries are a stride
    sample); the bucketed production path swaps in sim_lsh/ivf_topk's
    candidate generation, unchanged voting.

    Driver-verified as a `sim_eval_digest` member (queries/op_digests.py)
    against KNN_ORACLE, plus the direct pytest."""
    qn = _quantized_embeddings(spark, sf_dir, extra_cols=("label",)).withColumn(
        "label", F.col("label").cast("bigint")
    )
    queries = qn.where(F.col("vec_id") % QUERY_STRIDE == 0)
    train = qn.where(F.col("vec_id") % QUERY_STRIDE != 0)
    scored = (
        F.broadcast(queries.alias("q"))
        .join(train.alias("c"), F.lit(True))
        .select(
            F.col("q.vec_id").alias("query_id"),
            F.col("q.label").alias("actual_label"),
            F.col("c.vec_id").alias("neighbor_id"),
            F.col("c.label").alias("neighbor_label"),
            F.expr(
                "aggregate(zip_with(q.e, c.e, (x, y) -> x * y), 0L, (acc, x) -> acc + x)"
            ).alias("dot"),
            F.col("q.nrm").alias("na"),
            F.col("c.nrm").alias("nb"),
        )
        .withColumn("cos_sim", F.expr(_COS))
    )
    wn = Window.partitionBy("query_id").orderBy(
        F.desc("cos_sim"), F.asc("neighbor_id")
    )
    votes = (
        scored.withColumn("rank", F.row_number().over(wn))
        .where(F.col("rank") <= KNN_K)
        .groupBy("query_id", "actual_label", "neighbor_label")
        .agg(F.count(F.lit(1)).alias("votes"))
    )
    wv = Window.partitionBy("query_id").orderBy(
        F.desc("votes"), F.asc("neighbor_label")
    )
    return (
        votes.withColumn("vrank", F.row_number().over(wv))
        .where(F.col("vrank") == 1)
        .select(
            F.col("query_id").alias("vec_id"),
            "actual_label",
            F.col("neighbor_label").alias("predicted_label"),
            "votes",
            (F.col("neighbor_label") == F.col("actual_label")).alias(
                "is_correct"
            ),
        )
    )


KNN_ORACLE = f"""
WITH {_QUANT_CTE.strip()},
ln AS (
    SELECT n.vec_id, CAST(emb.label AS BIGINT) AS label, n.e, n.nrm
    FROM n JOIN embeddings emb USING (vec_id)
),
scored AS (
    SELECT q.vec_id AS query_id, q.label AS actual_label,
           c.vec_id AS neighbor_id, c.label AS neighbor_label,
           CAST(list_sum(list_transform(list_zip(q.e, c.e),
               pr -> pr[1] * pr[2])) AS BIGINT) AS dot,
           q.nrm AS na, c.nrm AS nb
    FROM ln q JOIN ln c
      ON q.vec_id % {QUERY_STRIDE} = 0 AND c.vec_id % {QUERY_STRIDE} != 0
),
ranked AS (
    SELECT query_id, actual_label, neighbor_label,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY {_COS_D} DESC, neighbor_id ASC) AS rank
    FROM scored
),
votes AS (
    SELECT query_id, actual_label, neighbor_label,
           CAST(count(*) AS BIGINT) AS votes
    FROM ranked WHERE rank <= {KNN_K}
    GROUP BY query_id, actual_label, neighbor_label
),
best AS (
    SELECT query_id, actual_label, neighbor_label, votes,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY votes DESC, neighbor_label ASC) AS vrank
    FROM votes
)
SELECT query_id AS vec_id, actual_label,
       neighbor_label AS predicted_label, votes,
       neighbor_label = actual_label AS is_correct
FROM best WHERE vrank = 1
"""


ORACLES: dict[str, str] = {
    "sim_topk_cosine": f"""
WITH {_QUANT_CTE.strip()},
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(list_sum(list_transform(list_zip(q.e, c.e),
               pr -> pr[1] * pr[2])) AS BIGINT) AS dot,
           q.nrm AS na, c.nrm AS nb
    FROM n q JOIN n c ON q.vec_id % {QUERY_STRIDE} = 0 AND q.vec_id != c.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, {_COS_D} AS cos_sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY {_COS_D} DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cos_sim
FROM ranked WHERE rank <= {TOP_K}
""",
    "sim_ivf_topk": f"""
WITH {_QUANT_CTE.strip()},
cents AS (SELECT vec_id AS cell, e AS ce, nrm AS cn FROM n WHERE vec_id < {N_CELLS}),
assign_scored AS (
    SELECT v.vec_id, v.e, v.nrm, c.cell,
           CAST(list_sum(list_transform(list_zip(v.e, c.ce),
               pr -> pr[1] * pr[2])) AS BIGINT) AS dot,
           v.nrm AS na, c.cn AS nb
    FROM n v CROSS JOIN cents c
),
assigned AS (
    SELECT vec_id, e, nrm, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY {_COS_D} DESC, cell ASC) AS rn
        FROM assign_scored
    ) WHERE rn = 1
),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(list_sum(list_transform(list_zip(q.e, c.e),
               pr -> pr[1] * pr[2])) AS BIGINT) AS dot,
           q.nrm AS na, c.nrm AS nb
    FROM assigned q JOIN assigned c
      ON q.cell = c.cell AND q.vec_id % {QUERY_STRIDE} = 0
         AND q.vec_id != c.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, {_COS_D} AS cos_sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY {_COS_D} DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cos_sim
FROM ranked WHERE rank <= {IVF_TOP_K}
""",
    "sim_lsh_topk": f"""
WITH {_QUANT_CTE.strip()},
b AS (SELECT vec_id, e, nrm, {_bucket_expr_duck()} AS bucket FROM n),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(list_sum(list_transform(list_zip(q.e, c.e),
               pr -> pr[1] * pr[2])) AS BIGINT) AS dot,
           q.nrm AS na, c.nrm AS nb
    FROM b q JOIN b c
      ON q.bucket = c.bucket AND q.vec_id % {QUERY_STRIDE} = 0
         AND q.vec_id != c.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, {_COS_D} AS cos_sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY {_COS_D} DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS INTEGER) AS rank, cos_sim
FROM ranked WHERE rank <= {LSH_TOP_K}
""",
}


# Multi-probe IVF (sim_ivf_probe2_topk) — driver-verified via
# sim_eval_digest (module constant, not an ORACLES entry, to keep the
# registry at the 50-slot budget).
PROBE2_ORACLE = f"""
WITH {_QUANT_CTE.strip()},
cents AS (SELECT vec_id AS cell, e AS ce, nrm AS cn FROM n WHERE vec_id < {N_CELLS}),
assign_scored AS (
    SELECT v.vec_id, v.e, v.nrm, c.cell,
           CAST(list_sum(list_transform(list_zip(v.e, c.ce),
               pr -> pr[1] * pr[2])) AS BIGINT) AS dot,
           v.nrm AS na, c.cn AS nb
    FROM n v CROSS JOIN cents c
),
ranked_assign AS (
    SELECT *, row_number() OVER (PARTITION BY vec_id
        ORDER BY {_COS_D} DESC, cell ASC) AS rn
    FROM assign_scored
),
assigned AS (
    SELECT vec_id, e, nrm, cell FROM ranked_assign WHERE rn = 1
),
probed AS (
    SELECT vec_id, e, nrm, cell FROM ranked_assign
    WHERE rn <= {IVF_NPROBE} AND vec_id % {QUERY_STRIDE} = 0
),
scored AS (
    SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
           CAST(list_sum(list_transform(list_zip(q.e, c.e),
               pr -> pr[1] * pr[2])) AS BIGINT) AS dot,
           q.nrm AS na, c.nrm AS nb
    FROM probed q JOIN assigned c
      ON q.cell = c.cell AND q.vec_id != c.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, {_COS_D} AS cos_sim,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY {_COS_D} DESC, neighbor_id ASC) AS rank
    FROM scored
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, cos_sim
FROM ranked WHERE rank <= {IVF_TOP_K}
"""


# IVF-PQ ADC search (sim_ivfpq_topk) — driver-verified via
# sim_eval_digest (module constant, registry slot budget). The
# relational replay of the same algorithm: per-(vector, codeword,
# subspace) exact integer L2 → windowed argmin (lowest-j tie-break,
# matching the sorted-fold's strict <) → reconstructed norms → query
# subspace dot products joined on (m, code) and summed — the LUT
# lookup, spelled as a join.
IVFPQ_ORACLE = f"""
WITH {_QUANT_CTE.strip()},
cents AS (SELECT vec_id AS cell, e AS ce, nrm AS cn FROM n WHERE vec_id < {N_CELLS}),
assign_scored AS (
    SELECT v.vec_id, v.e, v.nrm, c.cell,
           CAST(list_sum(list_transform(list_zip(v.e, c.ce),
               pr -> pr[1] * pr[2])) AS BIGINT) AS dot,
           v.nrm AS na, c.cn AS nb
    FROM n v CROSS JOIN cents c
),
assigned AS (
    SELECT vec_id, e, nrm, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY {_COS_D} DESC, cell ASC) AS rn
        FROM assign_scored
    ) WHERE rn = 1
),
cb AS (SELECT vec_id AS j, e AS cbe FROM n WHERE vec_id < {PQ_K}),
ms AS (SELECT unnest(generate_series(0, {PQ_M - 1})) AS m),
enc3 AS (
    SELECT a.vec_id, a.cell, b.j, ms.m,
           CAST(list_sum(list_transform(
               list_zip(list_slice(a.e, ms.m * {PQ_DSUB} + 1, ms.m * {PQ_DSUB} + {PQ_DSUB}),
                        list_slice(b.cbe, ms.m * {PQ_DSUB} + 1, ms.m * {PQ_DSUB} + {PQ_DSUB})),
               pr -> (pr[1] - pr[2]) * (pr[1] - pr[2]))) AS BIGINT) AS d,
           CAST(list_sum(list_transform(
               list_slice(b.cbe, ms.m * {PQ_DSUB} + 1, ms.m * {PQ_DSUB} + {PQ_DSUB}),
               x -> x * x)) AS BIGINT) AS sn
    FROM assigned a CROSS JOIN cb b CROSS JOIN ms
),
codes AS (
    SELECT vec_id, cell, m, j AS code, sn FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id, m
            ORDER BY d ASC, j ASC) AS rn
        FROM enc3
    ) WHERE rn = 1
),
recon AS (
    SELECT vec_id, any_value(cell) AS cell,
           GREATEST(CAST(sum(sn) AS BIGINT), 1) AS recon_nrm
    FROM codes GROUP BY vec_id
),
qsub AS (
    SELECT q.vec_id AS query_id, q.nrm AS qn, q.cell AS qcell, ms.m, b.j,
           CAST(list_sum(list_transform(
               list_zip(list_slice(q.e, ms.m * {PQ_DSUB} + 1, ms.m * {PQ_DSUB} + {PQ_DSUB}),
                        list_slice(b.cbe, ms.m * {PQ_DSUB} + 1, ms.m * {PQ_DSUB} + {PQ_DSUB})),
               pr -> pr[1] * pr[2])) AS BIGINT) AS sd
    FROM assigned q CROSS JOIN cb b CROSS JOIN ms
    WHERE q.vec_id % {QUERY_STRIDE} = 0
),
adots AS (
    SELECT s.query_id, c.vec_id AS neighbor_id,
           CAST(sum(s.sd) AS BIGINT) AS dot,
           any_value(s.qn) AS na, any_value(r.recon_nrm) AS nb
    FROM codes c
    JOIN recon r ON c.vec_id = r.vec_id
    JOIN qsub s ON s.m = c.m AND s.j = c.code AND s.qcell = r.cell
    WHERE s.query_id != c.vec_id
    GROUP BY s.query_id, c.vec_id
),
ranked AS (
    SELECT query_id, neighbor_id, {_COS_D} AS adc_sim,
           row_number() OVER (PARTITION BY query_id
               ORDER BY {_COS_D} DESC, neighbor_id ASC) AS rank
    FROM adots
)
SELECT query_id, neighbor_id, CAST(rank AS BIGINT) AS rank, adc_sim
FROM ranked WHERE rank <= {IVF_TOP_K}
"""


# Composition of the two registered oracles — the same derivation the
# Spark operator performs (pytest parity for sim_recall_at_k).
RECALL_ORACLE = f"""
WITH exact AS (
    SELECT * FROM ({ORACLES["sim_topk_cosine"]}) WHERE rank <= {LSH_TOP_K}
),
approx AS (
    SELECT * FROM ({ORACLES["sim_lsh_topk"]})
),
per_query AS (
    SELECT a.query_id,
           CAST(count(*) AS BIGINT) AS n_retrieved,
           CAST(sum(CASE WHEN e.neighbor_id IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hits
    FROM approx a
    LEFT JOIN exact e USING (query_id, neighbor_id)
    GROUP BY a.query_id
)
SELECT q.query_id,
       CAST(COALESCE(p.n_retrieved, 0) AS BIGINT) AS n_retrieved,
       CAST(COALESCE(p.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(COALESCE(p.n_hits, 0) AS DOUBLE) / {LSH_TOP_K} AS recall_at_k
FROM (SELECT vec_id AS query_id FROM embeddings
      WHERE vec_id % {QUERY_STRIDE} = 0) q
LEFT JOIN per_query p USING (query_id)
"""


# One Lloyd iteration (emb_kmeans_iter) — module constant like
# RECALL_ORACLE/KNN_ORACLE so it never enters LLM_CATALOG as its own
# slot; registered through sim_eval_digest instead.
KMEANS_ORACLE = f"""
WITH {_QUANT_CTE.strip()},
cents AS (SELECT vec_id AS cell, e AS ce, nrm AS cn FROM n WHERE vec_id < {N_CELLS}),
assign_scored AS (
    SELECT v.vec_id, v.e, v.nrm, c.cell,
           CAST(list_sum(list_transform(list_zip(v.e, c.ce),
               pr -> pr[1] * pr[2])) AS BIGINT) AS dot,
           v.nrm AS na, c.cn AS nb
    FROM n v CROSS JOIN cents c
),
assigned AS (
    SELECT vec_id, e, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY {_COS_D} DESC, cell ASC) AS rn
        FROM assign_scored
    ) WHERE rn = 1
),
coords AS (
    SELECT cell, CAST(generate_subscripts(e, 1) - 1 AS BIGINT) AS dim,
           unnest(e) AS coord
    FROM assigned
)
SELECT cell, dim,
       CAST(count(*) AS BIGINT) AS n_members,
       CAST(sum(coord) AS BIGINT) AS sum_coord,
       CAST(sum(coord) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_coord
FROM coords GROUP BY cell, dim
"""


# Second unrolled Lloyd iteration (emb_kmeans_iter2) — driver-verified
# via sim_eval_digest; the SQL re-runs assignment against iteration 1's
# means and reports per-coordinate centroid shift.
KMEANS2_ORACLE = f"""
WITH {_QUANT_CTE.strip()},
cents AS (SELECT vec_id AS cell, e AS ce, nrm AS cn FROM n WHERE vec_id < {N_CELLS}),
assign_scored AS (
    SELECT v.vec_id, v.e, v.nrm, c.cell,
           CAST(list_sum(list_transform(list_zip(v.e, c.ce),
               pr -> pr[1] * pr[2])) AS BIGINT) AS dot,
           v.nrm AS na, c.cn AS nb
    FROM n v CROSS JOIN cents c
),
assigned AS (
    SELECT vec_id, e, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY {_COS_D} DESC, cell ASC) AS rn
        FROM assign_scored
    ) WHERE rn = 1
),
coords AS (
    SELECT cell, CAST(generate_subscripts(e, 1) - 1 AS BIGINT) AS dim,
           unnest(e) AS coord
    FROM assigned
),
means1 AS (
    SELECT cell, dim,
           CAST(sum(coord) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_coord
    FROM coords GROUP BY cell, dim
),
cents2 AS (
    SELECT cell, list(mean_coord ORDER BY dim) AS ce,
           CAST(list_sum(list_transform(list(mean_coord ORDER BY dim),
               x -> x * x)) AS BIGINT) AS cn
    FROM means1 GROUP BY cell
),
assign2_scored AS (
    SELECT v.vec_id, v.e, c.cell,
           CAST(list_sum(list_transform(list_zip(v.e, c.ce),
               pr -> pr[1] * pr[2])) AS BIGINT) AS dot,
           v.nrm AS na, c.cn AS nb
    FROM n v CROSS JOIN cents2 c
),
assigned2 AS (
    SELECT vec_id, e, cell FROM (
        SELECT *, row_number() OVER (PARTITION BY vec_id
            ORDER BY {_COS_D} DESC, cell ASC) AS rn
        FROM assign2_scored
    ) WHERE rn = 1
),
coords2 AS (
    SELECT cell, CAST(generate_subscripts(e, 1) - 1 AS BIGINT) AS dim,
           unnest(e) AS coord
    FROM assigned2
),
means2 AS (
    SELECT cell, dim,
           CAST(count(*) AS BIGINT) AS n_members,
           CAST(sum(coord) AS BIGINT) AS sum_coord,
           CAST(sum(coord) AS BIGINT) // CAST(count(*) AS BIGINT) AS mean_coord
    FROM coords2 GROUP BY cell, dim
)
SELECT m2.cell, m2.dim, m2.n_members, m2.sum_coord, m2.mean_coord,
       CAST(abs(m2.mean_coord - m1.mean_coord) AS BIGINT) AS shift_abs
FROM means2 m2 JOIN means1 m1 ON m2.cell = m1.cell AND m2.dim = m1.dim
"""
