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


ORACLES: dict[str, str] = {"corpus_curate": _corpus_oracle()}
