"""Text-analysis operators over the `documents` table (beyond-reference
extension; BASELINE.json north star: "text analysis" for LLM data
pipelines).

Each operator is a narrow projection / aggregation kept entirely JVM-side
(built-in + higher-order functions — no Python UDFs), so Catalyst prunes
the parquet scan to (doc_id, text[, lang]) and the whole stage codegens.
At 100 TB these are embarrassingly parallel scans: no shuffle at all.

Every function has a generated DuckDB oracle (same algorithm, same
constants) in ORACLES — exact value parity, not approximate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from .common import LANG_LEXICONS, LANG_ORDER, STOPWORDS_EN

# Shared sub-expressions (Spark side). `split` / higher-order functions
# are Catalyst expressions — they run inside WholeStageCodegen.
_TOKS = "split(text, ' ')"
_BPE_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


def text_token_stats(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Token counting: whitespace tokens + a BPE-ish regex token count,
    type-token ratio, average token length."""
    docs = load_table(spark, "documents", sf_dir)
    return docs.select(
        "doc_id",
        F.expr(f"size({_TOKS})").alias("n_tokens"),
        F.expr(f"size(array_distinct({_TOKS}))").alias("n_distinct_tokens"),
        F.expr(f"size(regexp_extract_all(text, '{_BPE_RE}', 0))").alias("n_bpe_tokens"),
        F.expr(
            f"aggregate({_TOKS}, 0L, (acc, x) -> acc + length(x))"
        ).alias("sum_token_chars"),
        F.expr(
            f"aggregate({_TOKS}, 0L, (acc, x) -> acc + length(x))"
            f" / cast(size({_TOKS}) as double)"
        ).alias("avg_token_len"),
        F.expr(
            f"size(array_distinct({_TOKS})) / cast(size({_TOKS}) as double)"
        ).alias("type_token_ratio"),
    )


def quality_exprs(dialect: str) -> dict[str, str]:
    """The quality-score expression family, per dialect (shared by
    text_quality, its oracle, and llm/corpus.py::corpus_curate)."""
    spark = dialect == "spark"
    toks = _TOKS if spark else _TOKS_D
    sw = ", ".join(f"'{w}'" for w in STOPWORDS_EN)
    n = f"size({toks})" if spark else f"len({toks})"
    if spark:
        stop_hits = f"size(filter({toks}, x -> array_contains(array({sw}), x)))"
        long_hits = f"size(filter({toks}, x -> length(x) >= 7))"
        distinct_n = f"size(array_distinct({toks}))"
    else:
        stop_hits = f"len(list_filter({toks}, x -> list_contains([{sw}], x)))"
        long_hits = f"len(list_filter({toks}, x -> len(x) >= 7))"
        distinct_n = f"len(list_distinct({toks}))"
    cast_t = "double" if spark else "DOUBLE"
    score = (
        f"0.4e0 * least(1.0e0, {n} / 80e0)"
        f" + 0.3e0 * ({distinct_n} / cast({n} as {cast_t}))"
        f" + 0.2e0 * ({stop_hits} / cast({n} as {cast_t}))"
        f" + 0.1e0 * (1.0e0 - {long_hits} / cast({n} as {cast_t}))"
    )
    band = (
        f"case when {score} >= 0.55 then 'high'"
        f" when {score} >= 0.40 then 'medium' else 'low' end"
    )
    return {"n": n, "stop_hits": stop_hits, "long_hits": long_hits,
            "distinct_n": distinct_n, "score": score, "band": band,
            "cast_t": cast_t}


def text_quality(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Quality scoring: length/stopword/long-word signals combined into a
    fixed-shape score with a CASE band ladder (first-match-wins)."""
    docs = load_table(spark, "documents", sf_dir)
    e = quality_exprs("spark")
    n, stop_hits, long_hits, score = (
        e["n"], e["stop_hits"], e["long_hits"], e["score"]
    )
    return docs.select(
        "doc_id",
        F.expr(n).alias("n_tokens"),
        F.expr(stop_hits).alias("stopword_hits"),
        F.expr(f"{stop_hits} / cast({n} as double)").alias("stopword_ratio"),
        F.expr(f"{long_hits} / cast({n} as double)").alias("longword_ratio"),
        F.expr(score).alias("quality_score"),
        F.expr(
            f"case when {score} >= 0.55 then 'high'"
            f" when {score} >= 0.40 then 'medium' else 'low' end"
        ).alias("quality_band"),
    )


def text_langid(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Language ID via function-word lexicon scoring, argmax with a fixed
    tie-break order (the synthetic corpus shares one vocabulary across its
    lang labels, so this demonstrates the mechanism, scored against the
    label for an accuracy flag)."""
    docs = load_table(spark, "documents", sf_dir)
    scores = {}
    for lang in LANG_ORDER:
        lex = ", ".join(f"'{w}'" for w in LANG_LEXICONS[lang])
        scores[lang] = f"size(filter({_TOKS}, x -> array_contains(array({lex}), x)))"
    # first-match-wins argmax in LANG_ORDER
    pred = "case "
    for i, lang in enumerate(LANG_ORDER[:-1]):
        rest = [scores[o] for o in LANG_ORDER[i + 1:]]
        greatest = f"greatest({', '.join(rest)})" if len(rest) > 1 else rest[0]
        pred += f"when {scores[lang]} >= {greatest} then '{lang}' "
    pred += f"else '{LANG_ORDER[-1]}' end"
    return docs.select(
        "doc_id",
        F.col("lang").alias("label_lang"),
        *[F.expr(scores[lang]).alias(f"score_{lang}") for lang in LANG_ORDER],
        F.expr(pred).alias("predicted_lang"),
        (F.expr(pred) == F.col("lang")).alias("matches_label"),
    )


def text_fingerprint(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Document fingerprinting: md5 of the normalized text plus a 1-perm
    min-shingle hash (the degenerate minhash — a cheap content fingerprint
    that survives word-order-preserving edits)."""
    docs = load_table(spark, "documents", sf_dir)
    norm = "lower(trim(regexp_replace(text, '\\\\s+', ' ')))"
    toks = f"split({norm}, ' ')"
    shingles = (
        f"case when size({toks}) >= 3 then "
        f"transform(sequence(1, size({toks}) - 2),"
        f" i -> concat_ws(' ', slice({toks}, i, 3))) "
        f"else array({norm}) end"
    )
    min_shingle_hash = (
        f"array_min(transform({shingles},"
        f" s -> cast(conv(substring(md5(s), 1, 15), 16, 10) as long)))"
    )
    return docs.select(
        "doc_id",
        F.expr(f"md5({norm})").alias("md5_fingerprint"),
        F.expr(min_shingle_hash).alias("min_shingle_hash"),
        F.expr(f"length({norm})").alias("norm_chars"),
    )


# ------------------------------------------------------------- oracle SQL

_TOKS_D = "string_split(text, ' ')"


def _quality_oracle() -> str:
    e = quality_exprs("duck")
    n, stop_hits, long_hits, score = (
        e["n"], e["stop_hits"], e["long_hits"], e["score"]
    )
    return f"""
SELECT doc_id,
       {n} AS n_tokens,
       {stop_hits} AS stopword_hits,
       {stop_hits} / CAST({n} AS DOUBLE) AS stopword_ratio,
       {long_hits} / CAST({n} AS DOUBLE) AS longword_ratio,
       {score} AS quality_score,
       CASE WHEN {score} >= 0.55 THEN 'high'
            WHEN {score} >= 0.40 THEN 'medium' ELSE 'low' END AS quality_band
FROM documents
"""


def _langid_oracle() -> str:
    scores = {}
    for lang in LANG_ORDER:
        lex = ", ".join(f"'{w}'" for w in LANG_LEXICONS[lang])
        scores[lang] = f"len(list_filter({_TOKS_D}, x -> list_contains([{lex}], x)))"
    pred = "CASE "
    for i, lang in enumerate(LANG_ORDER[:-1]):
        rest = [scores[o] for o in LANG_ORDER[i + 1:]]
        greatest = f"greatest({', '.join(rest)})" if len(rest) > 1 else rest[0]
        pred += f"WHEN {scores[lang]} >= {greatest} THEN '{lang}' "
    pred += f"ELSE '{LANG_ORDER[-1]}' END"
    score_cols = ",\n       ".join(
        f"{scores[lang]} AS score_{lang}" for lang in LANG_ORDER
    )
    return f"""
SELECT doc_id,
       lang AS label_lang,
       {score_cols},
       {pred} AS predicted_lang,
       ({pred}) = lang AS matches_label
FROM documents
"""


def _fingerprint_oracle() -> str:
    norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    toks = f"string_split({norm}, ' ')"
    shingles = (
        f"CASE WHEN len({toks}) >= 3 THEN "
        f"list_transform(generate_series(1, len({toks}) - 2),"
        f" i -> array_to_string(({toks})[i:i+2], ' ')) "
        f"ELSE [{norm}] END"
    )
    min_shingle_hash = (
        f"CAST(list_min(list_transform({shingles},"
        f" s -> CAST('0x' || substr(md5(s), 1, 15) AS BIGINT))) AS BIGINT)"
    )
    return f"""
SELECT doc_id,
       md5({norm}) AS md5_fingerprint,
       {min_shingle_hash} AS min_shingle_hash,
       len({norm}) AS norm_chars
FROM documents
"""


ORACLES: dict[str, str] = {
    "text_token_stats": f"""
SELECT doc_id,
       len({_TOKS_D}) AS n_tokens,
       len(list_distinct({_TOKS_D})) AS n_distinct_tokens,
       len(regexp_extract_all(text, '{_BPE_RE}')) AS n_bpe_tokens,
       CAST(list_sum(list_transform({_TOKS_D}, x -> len(x))) AS BIGINT)
           AS sum_token_chars,
       CAST(list_sum(list_transform({_TOKS_D}, x -> len(x))) AS BIGINT)
           / CAST(len({_TOKS_D}) AS DOUBLE) AS avg_token_len,
       len(list_distinct({_TOKS_D})) / CAST(len({_TOKS_D}) AS DOUBLE)
           AS type_token_ratio
FROM documents
""",
    "text_quality": _quality_oracle(),
    "text_langid": _langid_oracle(),
    "text_fingerprint": _fingerprint_oracle(),
}
