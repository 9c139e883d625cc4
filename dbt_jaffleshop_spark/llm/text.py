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


# --------------------------------------------------------- PII scrubbing

# Shared Java-regex/RE2-compatible patterns (no backreferences/lookarounds,
# so Spark's Java regex and DuckDB's RE2 agree on every match).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\+1 555 \d{4}"

# The synthetic corpus contains no real PII, so the operator would count
# zero everywhere and never exercise its replace path. A deterministic
# injected-PII suffix (derived from doc_id, mirrored in the oracle) makes
# every row carry one email, one IPv4, and one phone — the scrub is then
# verified doing real work on every document.
_PII_SUFFIX = (
    "concat(' reach u', cast(doc_id as string), '@example.com from 10.0.',"
    " cast(doc_id % 256 as string), '.', cast((doc_id * 7) % 256 as string),"
    " ' or +1 555 ', lpad(cast(doc_id % 10000 as string), 4, '0'))"
)
_PII_SUFFIX_D = (
    "' reach u' || CAST(doc_id AS VARCHAR) || '@example.com from 10.0.'"
    " || CAST(doc_id % 256 AS VARCHAR) || '.'"
    " || CAST((doc_id * 7) % 256 AS VARCHAR) || ' or +1 555 '"
    " || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')"
)


def text_pii_scrub(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """PII scrubbing: count and redact emails / IPv4 addresses / phone
    numbers with JVM-side regexp_extract_all + chained regexp_replace —
    an embarrassingly-parallel scan, no shuffle, no Python in the path.
    At 100 TB this composes with corpus_curate as another per-row pass."""
    docs = load_table(spark, "documents", sf_dir)
    raw = F.expr(f"concat(text, {_PII_SUFFIX})")
    scrubbed = raw
    for pat, rep in (
        (PII_EMAIL_RE, "[EMAIL]"),
        (PII_IPV4_RE, "[IP]"),
        (PII_PHONE_RE, "[PHONE]"),
    ):
        scrubbed = F.regexp_replace(scrubbed, F.lit(pat), F.lit(rep))
    return docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(raw, F.lit(PII_EMAIL_RE), F.lit(0))).alias("n_emails"),
        F.size(F.regexp_extract_all(raw, F.lit(PII_IPV4_RE), F.lit(0))).alias("n_ipv4"),
        F.size(F.regexp_extract_all(raw, F.lit(PII_PHONE_RE), F.lit(0))).alias("n_phones"),
        F.md5(scrubbed).alias("scrubbed_md5"),
        F.length(scrubbed).alias("scrubbed_chars"),
    )


# ------------------------------------------------- repetition quality

# Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
# Models", §A1.1 repetition filters): heavily repetitious text is
# low-quality training data even when token-level stats look fine.
REP_TOP2_MAX = 0.20   # max fraction of 2-grams taken by the most common one
REP_DUP3_MAX = 0.30   # max fraction of 3-gram occurrences that are repeats


def _grams(toks: str, k: int, dialect: str) -> str:
    if dialect == "spark":
        return (
            f"case when size({toks}) >= {k} then "
            f"transform(sequence(1, size({toks}) - {k - 1}),"
            f" i -> concat_ws(' ', slice({toks}, i, {k}))) "
            f"else array() end"
        )
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_transform(generate_series(1, len({toks}) - {k - 1}),"
        f" i -> array_to_string(({toks})[i:i+{k - 1}], ' ')) "
        f"ELSE [] END"
    )


def repetition_exprs(dialect: str) -> dict[str, str]:
    """Shared Spark/DuckDB expression family for text_repetition."""
    spark = dialect == "spark"
    toks = _TOKS if spark else _TOKS_D
    g2, g3 = _grams(toks, 2, dialect), _grams(toks, 3, dialect)
    if spark:
        n2, n3 = f"size({g2})", f"size({g3})"
        d3 = f"size(array_distinct({g3}))"
        max2 = (
            f"coalesce(array_max(transform(array_distinct({g2}),"
            f" g -> size(filter({g2}, x -> x = g)))), 0)"
        )
    else:
        n2, n3 = f"len({g2})", f"len({g3})"
        d3 = f"len(list_distinct({g3}))"
        max2 = (
            f"coalesce(list_max(list_transform(list_distinct({g2}),"
            f" g -> len(list_filter({g2}, x -> x = g)))), 0)"
        )
    top2 = f"case when {n2} > 0 then {max2} / cast({n2} as double) else 0.0e0 end"
    dup3 = (
        f"case when {n3} > 0 then"
        f" ({n3} - {d3}) / cast({n3} as double) else 0.0e0 end"
    )
    flag = f"({top2}) > {REP_TOP2_MAX} or ({dup3}) > {REP_DUP3_MAX}"
    return {"n2": n2, "n3": n3, "top2": top2, "dup3": dup3, "flag": flag}


# Most-common-2-gram count as a sorted run-length scan: O(n log n) per doc
# instead of the naive distinct×filter O(n²), and the gram array is bound
# to a real column so it is materialized once per row rather than
# re-expanded at every textual reference. Values are identical to the
# naive form (the DuckDB oracle keeps it — repetition_exprs("duck")).
_MAX_RUN = (
    "aggregate(array_sort(g2),"
    " named_struct('prev', cast(null as string), 'run', 0L, 'best', 0L),"
    " (acc, x) -> named_struct("
    "   'prev', x,"
    "   'run', case when x <=> acc.prev then acc.run + 1 else 1L end,"
    "   'best', greatest(acc.best,"
    "       case when x <=> acc.prev then acc.run + 1 else 1L end)),"
    " acc -> acc.best)"
)


def text_repetition(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Repetition-ratio quality signals: the most-common-2-gram fraction
    and the duplicate-3-gram fraction, with a Gopher-style keep/flag
    decision. Pure higher-order-function scan — no explode, no shuffle;
    per-doc cost is O(tokens·log tokens) (array_sort + one-pass run-length
    aggregate), bounded by document length, not corpus size."""
    docs = load_table(spark, "documents", sf_dir)
    scored = docs.select(
        "doc_id", F.expr(_TOKS).alias("toks")
    ).select(
        "doc_id",
        F.expr("size(toks)").alias("n_tokens"),
        F.expr(_grams("toks", 2, "spark")).alias("g2"),
        F.expr(_grams("toks", 3, "spark")).alias("g3"),
    ).select(
        "doc_id",
        "n_tokens",
        F.expr("size(g2)").alias("n_2grams"),
        F.expr(
            f"case when size(g2) > 0 then {_MAX_RUN} / cast(size(g2) as double)"
            " else 0.0e0 end"
        ).alias("top_2gram_frac"),
        F.expr(
            "case when size(g3) > 0 then"
            " (size(g3) - size(array_distinct(g3))) / cast(size(g3) as double)"
            " else 0.0e0 end"
        ).alias("dup_3gram_frac"),
    )
    return scored.withColumn(
        "is_repetitive",
        (F.col("top_2gram_frac") > F.lit(REP_TOP2_MAX))
        | (F.col("dup_3gram_frac") > F.lit(REP_DUP3_MAX)),
    )


# ---------------------------------------------------------- chunking

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def doc_chunk(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Chunk documents into overlapping fixed-size token windows (the
    standard pretraining-corpus prep step before tokenization/packing).
    One explode over a computed chunk-index sequence — rows fan out
    ~n_tokens/stride×, everything stays JVM-side, and the output
    partitioning follows the input (no shuffle)."""
    docs = load_table(spark, "documents", sf_dir)
    n = f"size({_TOKS})"
    n_chunks = (
        f"case when {n} <= {CHUNK_TOKENS} then 1 "
        f"else cast(ceil(({n} - {CHUNK_TOKENS}) / {CHUNK_STRIDE}.0) as int) + 1 end"
    )
    base = docs.select(
        "doc_id",
        F.expr(_TOKS).alias("toks"),
        F.explode(F.expr(f"sequence(0, {n_chunks} - 1)")).alias("chunk_idx"),
    )
    start = f"1 + chunk_idx * {CHUNK_STRIDE}"
    ctoks = f"slice(toks, {start}, {CHUNK_TOKENS})"
    return base.select(
        "doc_id",
        "chunk_idx",
        F.expr(start).alias("start_token"),
        F.expr(f"size({ctoks})").alias("chunk_n_tokens"),
        F.expr(f"md5(concat_ws(' ', {ctoks}))").alias("chunk_md5"),
    )


# -------------------------------------------------------- tf-idf top-k

TFIDF_TOPK = 3


def text_tfidf_topk(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Top-3 most characteristic terms per document by a log-free tf-idf
    surrogate: score_bp = (tf · 10000) div df — integer basis points of
    the term-frequency / document-frequency ratio. The log-free form is
    deliberate: ln() is not correctly-rounded-guaranteed across engines,
    while integer division is bit-exact everywhere. The floor to basis
    points makes the ranking only WEAKLY order-preserving in tf/df:
    ratios closer than 1/10000 collapse to the same score_bp, and such
    ties (plus exact-ratio ties) break on the term string — the metric
    is DEFINED as this quantized ranking, identically in both engines.

    Plan shape for 100 TB: explode → groupBy(doc_id, term) for tf,
    groupBy(term) for df on the already-reduced pair relation, an
    equi-join back on term, and a row_number window PARTITIONED by
    doc_id — four key-partitioned exchanges, no global window, no
    driver-side scalar (the formulation is corpus-size-free)."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    tf = (
        docs.select("doc_id", F.explode(F.expr(_TOKS)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(df_, "term").withColumn(
        "score_bp", F.expr("(tf * 10000) div df")
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("score_bp").desc(), F.col("term").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= TFIDF_TOPK)
        .select("doc_id", "rank", "term", "tf", "df", "score_bp")
    )


def _tfidf_oracle() -> str:
    return f"""
WITH tf AS (
    SELECT doc_id, unnest({_TOKS_D}) AS term FROM documents
),
tfc AS (
    SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
    FROM tf GROUP BY doc_id, term
),
dfc AS (
    SELECT term, CAST(count(*) AS BIGINT) AS df FROM tfc GROUP BY term
),
scored AS (
    SELECT t.doc_id, t.term, t.tf, d.df,
           (t.tf * 10000) // d.df AS score_bp,
           row_number() OVER (
               PARTITION BY t.doc_id
               ORDER BY (t.tf * 10000) // d.df DESC, t.term ASC
           ) AS rank
    FROM tfc t JOIN dfc d USING (term)
)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, term, tf, df, score_bp
FROM scored WHERE rank <= {TFIDF_TOPK}
"""


# -------------------------------------------------- corpus Zipf top-k

ZIPF_TOPK = 25


def text_zipf_topk(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Corpus vocabulary head (r5): the top-25 terms by occurrence count
    (ties broken on the term string), each with its rank, count, running
    cumulative count over the ranked head, and the cumulative corpus
    coverage in integer basis points — the Zipf head/coverage profile a
    tokenizer-budget or stopword analysis starts from.

    Plan shape for 100 TB: explode → groupBy(term) is one partial-
    aggregated shuffle onto the vocabulary relation; the global top-k
    filter compiles to TakeOrderedAndProject(limit=25) UNDER the
    row_number window (per-partition partial top-25, merged once —
    pinned by a plan test), so no single-partition stage ever sees the
    vocabulary; the cumulative window then runs on 25 rows. The corpus
    total joins as a 1-row broadcast."""
    from pyspark.sql import Window

    docs = load_table(spark, "documents", sf_dir)
    counts = (
        docs.select(F.explode(F.expr(_TOKS)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )
    total = counts.agg(
        F.sum("n_occurrences").cast("bigint").alias("total_occurrences")
    )
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("term").asc())
    head = (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("rank") <= ZIPF_TOPK)
        .crossJoin(F.broadcast(total))
    )
    cum = Window.orderBy("rank").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return head.withColumn(
        "cum_occurrences", F.sum("n_occurrences").over(cum).cast("bigint")
    ).select(
        "rank",
        "term",
        "n_occurrences",
        "cum_occurrences",
        F.expr("cum_occurrences * 10000 div total_occurrences").alias("cum_bp"),
    )


def _zipf_oracle() -> str:
    return f"""
WITH tok AS (
    SELECT unnest({_TOKS_D}) AS term FROM documents
),
cnt AS (
    SELECT term, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM tok GROUP BY term
),
tot AS (
    SELECT CAST(sum(n_occurrences) AS BIGINT) AS total_occurrences FROM cnt
),
rk AS (
    SELECT term, n_occurrences,
           CAST(row_number() OVER (
               ORDER BY n_occurrences DESC, term ASC
           ) AS BIGINT) AS rank
    FROM cnt
)
SELECT rank, term, n_occurrences,
       CAST(sum(n_occurrences) OVER (ORDER BY rank) AS BIGINT)
           AS cum_occurrences,
       (CAST(sum(n_occurrences) OVER (ORDER BY rank) AS BIGINT) * 10000)
           // total_occurrences AS cum_bp
FROM rk, tot WHERE rank <= {ZIPF_TOPK}
"""


# ------------------------------------------------------------- oracle SQL

# ------------------------------------------ bigram-LM quality scoring

def text_lm_score(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Corpus-trained bigram language-model scoring — the CCNet-style
    quality signal (Wenzek et al. 2019 score docs by LM perplexity;
    public): fluent/typical documents have likely token transitions,
    gibberish and boilerplate-shuffled text do not. The "model" is the
    corpus's own bigram statistics; each adjacent token pair (a, b)
    scores the integer conditional probability

        cond_bp(a, b) = count(a, b) * 10000 div count(a)

    and a document reports its pair count, total, and integer mean —
    a log-free perplexity surrogate that is bit-exact across engines
    (a true log-prob mean would be IEEE-summation-order dependent).
    The band is CCNet's head/tail split made scale-safe: docs at or
    above the corpus-wide mean conditional probability are 'head',
    the rest 'tail' (CCNet's exact perplexity terciles would need a
    global ntile — a single-partition window; the broadcast-scalar
    mean split keeps the same signal with zero windows).

    Plan shape for 100 TB: unigram and bigram counts are two
    partial-aggregated groupBys over the token/pair explodes; the
    scored join keys pairs on (a, b) — at this corpus's vocabulary the
    count relations broadcast, at web scale they become ordinary
    AQE-planned hash joins on uniform hash keys. No window anywhere."""
    docs = load_table(spark, "documents", sf_dir)
    pairs_expr = (
        f"case when size({_TOKS}) >= 2 then "
        f"transform(sequence(1, size({_TOKS}) - 1),"
        f" i -> struct(element_at({_TOKS}, i) as a,"
        f" element_at({_TOKS}, i + 1) as b))"
        " else array() end"
    )
    pairs = docs.select("doc_id", F.expr(f"inline({pairs_expr})"))
    uni = (
        docs.select(F.explode(F.expr(_TOKS)).alias("a"))
        .groupBy("a")
        .agg(F.count(F.lit(1)).alias("c1"))
    )
    bi = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("c2"))
    cond = bi.join(uni, "a").select(
        "a", "b", F.expr("c2 * 10000 div c1").alias("cond_bp")
    )
    # no broadcast hint: the cond relation is bigram-cardinality
    # (corpus-sized at web scale) — let AQE broadcast it only when it
    # measures small, and fall back to an ordinary hash join otherwise
    per_doc = (
        pairs.join(cond, ["a", "b"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum("cond_bp").alias("sum_cond_bp"),
        )
        .withColumn("mean_cond_bp", F.expr("sum_cond_bp div n_pairs"))
    )
    # corpus-wide mean conditional probability: one broadcast scalar
    corpus = per_doc.agg(
        F.expr("sum(sum_cond_bp) div sum(n_pairs)").alias("corpus_mean_bp")
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .crossJoin(F.broadcast(corpus))
        .select(
            "doc_id",
            F.coalesce(F.col("n_pairs"), F.lit(0).cast("bigint")).alias(
                "n_pairs"
            ),
            F.coalesce(F.col("sum_cond_bp"), F.lit(0).cast("bigint")).alias(
                "sum_cond_bp"
            ),
            F.coalesce(F.col("mean_cond_bp"), F.lit(0).cast("bigint")).alias(
                "mean_cond_bp"
            ),
            F.when(F.col("n_pairs").isNull(), "empty")
            .when(F.col("mean_cond_bp") >= F.col("corpus_mean_bp"), "head")
            .otherwise("tail")
            .alias("lm_band"),
        )
    )


def _lm_score_oracle() -> str:
    return f"""
WITH base AS (
    SELECT doc_id, {_TOKS_D} AS toks FROM documents
),
idx AS (
    SELECT doc_id, toks,
           unnest(CASE WHEN len(toks) >= 2
               THEN generate_series(1, len(toks) - 1) ELSE [] END) AS i
    FROM base
),
pairs AS (
    SELECT doc_id, toks[i] AS a, toks[i + 1] AS b FROM idx
),
uni AS (
    SELECT unnest(toks) AS a FROM base
),
c1 AS (
    SELECT a, CAST(count(*) AS BIGINT) AS c1 FROM uni GROUP BY a
),
c2 AS (
    SELECT a, b, CAST(count(*) AS BIGINT) AS c2 FROM pairs GROUP BY a, b
),
cond AS (
    SELECT c2.a, c2.b, c2.c2 * 10000 // c1.c1 AS cond_bp
    FROM c2 JOIN c1 ON c2.a = c1.a
),
per_doc AS (
    SELECT p.doc_id,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(cond_bp) AS BIGINT) AS sum_cond_bp,
           CAST(sum(cond_bp) // count(*) AS BIGINT) AS mean_cond_bp
    FROM pairs p JOIN cond ON p.a = cond.a AND p.b = cond.b
    GROUP BY p.doc_id
),
corpus AS (
    SELECT CAST(sum(sum_cond_bp) // sum(n_pairs) AS BIGINT)
        AS corpus_mean_bp
    FROM per_doc
)
SELECT d.doc_id,
       CAST(COALESCE(pd.n_pairs, 0) AS BIGINT) AS n_pairs,
       CAST(COALESCE(pd.sum_cond_bp, 0) AS BIGINT) AS sum_cond_bp,
       CAST(COALESCE(pd.mean_cond_bp, 0) AS BIGINT) AS mean_cond_bp,
       CASE WHEN pd.n_pairs IS NULL THEN 'empty'
            WHEN pd.mean_cond_bp >= c.corpus_mean_bp THEN 'head'
            ELSE 'tail' END AS lm_band
FROM documents d LEFT JOIN per_doc pd USING (doc_id), corpus c
"""


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


def _pii_oracle() -> str:
    raw = f"text || ({_PII_SUFFIX_D})"
    scrubbed = raw
    for pat, rep in (
        (PII_EMAIL_RE, "[EMAIL]"),
        (PII_IPV4_RE, "[IP]"),
        (PII_PHONE_RE, "[PHONE]"),
    ):
        scrubbed = f"regexp_replace({scrubbed}, '{pat}', '{rep}', 'g')"
    return f"""
SELECT doc_id,
       len(regexp_extract_all({raw}, '{PII_EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all({raw}, '{PII_IPV4_RE}')) AS n_ipv4,
       len(regexp_extract_all({raw}, '{PII_PHONE_RE}')) AS n_phones,
       md5({scrubbed}) AS scrubbed_md5,
       len({scrubbed}) AS scrubbed_chars
FROM documents
"""


def _repetition_oracle() -> str:
    e = repetition_exprs("duck")
    return f"""
SELECT doc_id,
       len({_TOKS_D}) AS n_tokens,
       {e["n2"]} AS n_2grams,
       {e["top2"]} AS top_2gram_frac,
       {e["dup3"]} AS dup_3gram_frac,
       {e["flag"]} AS is_repetitive
FROM documents
"""


def _chunk_oracle() -> str:
    n = f"len({_TOKS_D})"
    n_chunks = (
        f"CASE WHEN {n} <= {CHUNK_TOKENS} THEN 1 "
        f"ELSE CAST(ceil(({n} - {CHUNK_TOKENS}) / {CHUNK_STRIDE}.0) AS INTEGER) + 1 END"
    )
    start = f"1 + chunk_idx * {CHUNK_STRIDE}"
    ctoks = f"(toks)[{start}:{start} + {CHUNK_TOKENS - 1}]"
    return f"""
WITH base AS (
    SELECT doc_id, {_TOKS_D} AS toks,
           unnest(generate_series(0, ({n_chunks}) - 1)) AS chunk_idx
    FROM documents
)
SELECT doc_id,
       CAST(chunk_idx AS INTEGER) AS chunk_idx,
       CAST({start} AS INTEGER) AS start_token,
       len({ctoks}) AS chunk_n_tokens,
       md5(array_to_string({ctoks}, ' ')) AS chunk_md5
FROM base
"""


ORACLES: dict[str, str] = {
    "text_tfidf_topk": _tfidf_oracle(),
    "text_zipf_topk": _zipf_oracle(),
    "text_lm_score": _lm_score_oracle(),
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
    "text_pii_scrub": _pii_oracle(),
    "text_repetition": _repetition_oracle(),
    "doc_chunk": _chunk_oracle(),
}
