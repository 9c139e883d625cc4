"""End-to-end corpus curation decision table (beyond-reference; the
composition every LLM training-data pipeline runs before tokenization).

One pass over `documents` produces the full keep/drop decision per doc:

    keep = is_canonical            (exact-dedup: md5-normalized, min-id)
         AND quality_band != 'low' (text.py quality score)
         AND n_tokens >= MIN_TOKENS AND n_tokens <= MAX_TOKENS

Emitting the DECISION TABLE (every doc with its signals and verdict)
rather than only survivors makes the operator fully hash-checkable and
is what a production pipeline materializes anyway (audit + re-threshold
without recompute).

Scale shape: the ONLY shuffle is the exact-dedup fingerprint groupBy —
quality/token signals are embarrassingly parallel codegen'd scans fused
into the same stage. At 100 TB: one exchange, keyed by md5 (uniform).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .dedup import _NORM, _NORM_D
from .text import quality_exprs

MIN_TOKENS = 5
MAX_TOKENS = 5_000


def corpus_curate(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    e = quality_exprs("spark")
    docs = load_table(spark, "documents", sf_dir)
    d = docs.select(
        "doc_id",
        F.expr(f"md5({_NORM})").alias("fingerprint"),
        F.expr(e["n"]).alias("n_tokens"),
        F.expr(e["score"]).alias("quality_score"),
        F.expr(e["band"]).alias("quality_band"),
    )
    canon = d.groupBy("fingerprint").agg(
        F.min("doc_id").alias("canonical_doc_id")
    )
    keep = (
        (F.col("doc_id") == F.col("canonical_doc_id"))
        & (F.col("quality_band") != "low")
        & (F.col("n_tokens") >= MIN_TOKENS)
        & (F.col("n_tokens") <= MAX_TOKENS)
    )
    return (
        d.join(canon, "fingerprint")
        .select(
            "doc_id",
            "n_tokens",
            "quality_score",
            "quality_band",
            (F.col("doc_id") == F.col("canonical_doc_id")).alias("is_canonical"),
            keep.alias("keep"),
        )
    )


# ------------------------------------------- stratified sampling

# Per-language keep rates in basis points of 10,000 — the standard
# corpus-mixing move (down-weight over-represented strata, keep rare
# ones whole). Deterministic: membership is a pure function of doc_id,
# so the sample is reproducible across runs/engines and stable under
# corpus growth (a doc's verdict never depends on other docs).
SAMPLE_RATES_BP: dict[str, int] = {
    "en": 5000, "de": 10000, "es": 2500, "fr": 10000, "zh": 7500,
}
_SAMPLE_MOD = 10_000
_SAMPLE_SALT = "sample-v1:"


def corpus_sample_stratified(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Stratified hash sampling: keep a doc iff its salted-md5 bucket
    falls under its stratum's rate. Pure per-row filter — no shuffle, no
    randomness (rand() would be irreproducible and break partition
    retries); at 100 TB this is a predicate fused into the scan."""
    docs = load_table(spark, "documents", sf_dir)
    bucket = (
        f"cast(conv(substring(md5(concat('{_SAMPLE_SALT}',"
        f" cast(doc_id as string))), 1, 15), 16, 10) as long) % {_SAMPLE_MOD}"
    )
    rate = "case " + " ".join(
        f"when lang = '{lg}' then {bp}" for lg, bp in SAMPLE_RATES_BP.items()
    ) + " else 0 end"
    return (
        docs.select(
            "doc_id",
            "lang",
            F.expr(bucket).alias("sample_bucket"),
            F.expr(rate).alias("stratum_rate_bp"),
        )
        .where(F.col("sample_bucket") < F.col("stratum_rate_bp"))
    )


def _sample_oracle() -> str:
    bucket = (
        f"CAST('0x' || substr(md5('{_SAMPLE_SALT}'"
        f" || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % {_SAMPLE_MOD}"
    )
    rate = "CASE " + " ".join(
        f"WHEN lang = '{lg}' THEN {bp}" for lg, bp in SAMPLE_RATES_BP.items()
    ) + " ELSE 0 END"
    return f"""
WITH s AS (
    SELECT doc_id, lang,
           {bucket} AS sample_bucket,
           {rate} AS stratum_rate_bp
    FROM documents
)
SELECT doc_id, lang, sample_bucket, stratum_rate_bp
FROM s WHERE sample_bucket < stratum_rate_bp
"""


def _corpus_oracle() -> str:
    e = quality_exprs("duck")
    return f"""
WITH d AS (
    SELECT doc_id,
           md5({_NORM_D}) AS fingerprint,
           {e["n"]} AS n_tokens,
           {e["score"]} AS quality_score,
           {e["band"]} AS quality_band
    FROM documents
),
canon AS (
    SELECT fingerprint, min(doc_id) AS canonical_doc_id
    FROM d GROUP BY fingerprint
)
SELECT d.doc_id, d.n_tokens, d.quality_score, d.quality_band,
       d.doc_id = c.canonical_doc_id AS is_canonical,
       (d.doc_id = c.canonical_doc_id
        AND d.quality_band != 'low'
        AND d.n_tokens >= {MIN_TOKENS}
        AND d.n_tokens <= {MAX_TOKENS}) AS keep
FROM d JOIN canon c ON d.fingerprint = c.fingerprint
"""


ORACLES: dict[str, str] = {
    "corpus_curate": _corpus_oracle(),
    "corpus_sample_stratified": _sample_oracle(),
}


N_SHARDS = 8
_SHUFFLE_SALT = "shuffle7:"


def corpus_shuffle_shard(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Deterministic global shuffle + sharding (r7) — the
    write-the-training-set move: every epoch-0 data loader wants the
    corpus in a pseudorandom order split into fixed shards, and doing
    it with rand() is irreproducible (partition retries re-draw).
    Instead the permutation IS a hash: h = md5(salt || doc_id) gives
    each doc a shard (h mod N_SHARDS) and a position (rank of h within
    the shard), so any engine — and any retry — derives the identical
    layout. Output is the (doc_id, shard, pos, n_tokens) manifest a
    sharded writer consumes.

    Scale shape for 100 TB: ONE shuffle on the shard key, then a
    per-shard sort — the unavoidable cost of a global shuffle, but
    parallel across shards and AQE-splittable; no global window, no
    driver-side state. Pick N_SHARDS so a shard's manifest fits an
    executor (the docs themselves move later, streamed per shard).
    Tie-break doc_id keeps the order total even under hash collisions.
    """
    from pyspark.sql import Window

    from .text import quality_exprs

    e = quality_exprs("spark")
    h = (
        f"cast(conv(substring(md5(concat('{_SHUFFLE_SALT}',"
        f" cast(doc_id as string))), 1, 15), 16, 10) as long)"
    )
    docs = load_table(spark, "documents", sf_dir).select(
        "doc_id",
        F.expr(h).alias("h"),
        F.expr(e["n"]).alias("n_tokens"),
    )
    w = Window.partitionBy("shard").orderBy("h", "doc_id")
    return (
        docs.withColumn("shard", F.expr(f"h % {N_SHARDS}"))
        .withColumn("pos", F.row_number().over(w))
        .select("doc_id", "shard", "pos", "n_tokens")
    )


def _shuffle_oracle() -> str:
    from .text import quality_exprs

    e = quality_exprs("duck")
    h = (
        f"CAST('0x' || substr(md5('{_SHUFFLE_SALT}'"
        f" || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT)"
    )
    return f"""
WITH d AS (
    SELECT doc_id, {h} AS h, {e["n"]} AS n_tokens
    FROM documents
)
SELECT doc_id, h % {N_SHARDS} AS shard,
       CAST(row_number() OVER (
           PARTITION BY h % {N_SHARDS} ORDER BY h, doc_id
       ) AS INTEGER) AS pos,
       n_tokens
FROM d
"""


ORACLES["corpus_shuffle_shard"] = _shuffle_oracle()
