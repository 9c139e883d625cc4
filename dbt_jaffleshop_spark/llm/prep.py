"""Training-corpus preparation operators (beyond-reference extensions;
SURVEY §7.5 / BASELINE.json north star — the ops a 100 TB pretraining
pipeline runs between raw corpus and tokenizer):

* ``corpus_decontaminate`` — benchmark-overlap flagging: a corpus document
  is contaminated when it shares any 8-token n-gram with the held-out
  eval set (the standard train/test decontamination step, e.g. GPT-3
  appendix C / PaLM §6.1 n-gram collision checks). The eval set here is
  the deterministic ``doc_id % 97 == 0`` slice of ``documents``.
* ``doc_pack`` — sequence packing: concat-then-split documents into
  fixed-size token contexts per language (the standard pretraining prep
  that turns ragged docs into dense fixed-length training rows).
* ``emb_quantize`` — int8 symmetric scalar quantization of embeddings
  with exact integer reconstruction-error metrics (the storage/ANN
  compression step; errors stay integer so parity is bit-exact).
* ``doc_dup_grams`` (r4) — per-doc duplicated-substring fraction over
  16-token grams (suffix-array-dedup analysis at fixed width).
* ``corpus_source_stats`` (r4) — per-source quality/dup stats and a
  keep/drop verdict (domain-level filtering).
* ``doc_cdc_chunks`` (r4) — content-defined chunking via a rolling-hash
  cut rule (boundaries re-sync across near-duplicates).

All are pure DataFrame algebra (higher-order functions, key-partitioned
aggregations, one broadcast join); oracles are independent DuckDB SQL
over the identical fixed constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources import load_table
from .common import EMB_SCALE, HASH60_SPARK_SQL, HASH60_SQL

# ------------------------------------------------- decontamination

DECON_K = 8          # n-gram width for overlap detection
DECON_EVAL_MOD = 97  # doc_id % MOD == 0 → held-out eval slice

_TOKS = "split(text, ' ')"
_TOKS_D = "string_split(text, ' ')"

# Distinct hashed k-gram shingles per doc, computed entirely per-row
# (array_distinct BEFORE the explode → the dedup work is narrow). The
# parameterized template serves decontamination (k=8) and the
# duplicated-substring analysis (k=16) — ONE definition per engine.
def _g_hashes(k: int, toks: str) -> str:
    """Spark SQL: distinct hashed k-gram shingles, computed per-row."""
    return (
        f"case when size({toks}) >= {k} then "
        f"array_distinct(transform(sequence(1, size({toks}) - {k - 1}),"
        " i -> " + HASH60_SPARK_SQL.format(
            s=f"concat_ws(' ', slice({toks}, i, {k}))"
        )
        + "))"
        " else array() end"
    )


def _g_hashes_duck(k: int, toks: str) -> str:
    return (
        f"CASE WHEN len({toks}) >= {k} THEN "
        f"list_distinct(list_transform(generate_series(1, len({toks}) - {k - 1}),"
        " i -> " + HASH60_SQL.format(
            s=f"array_to_string(({toks})[i:i+{k - 1}], ' ')"
        )
        + ")) ELSE [] END"
    )


_G8_HASHES = _g_hashes(DECON_K, _TOKS)
_G8_HASHES_D = _g_hashes_duck(DECON_K, _TOKS_D)


def corpus_decontaminate(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Flag corpus documents sharing ≥1 8-gram with the eval slice.

    Plan shape for 100 TB: the eval side is benchmark-sized (thousands of
    docs), so its distinct shingle-hash set broadcasts; the corpus side is
    one narrow explode → broadcast-hash semi-join → partial-aggregated
    count per doc. No corpus-sized shuffle anywhere, and nothing
    corpus-sized is cached: the eval slice gets its OWN tiny explode
    (predicate pushed to the scan), so the corpus-side explode streams
    straight through the broadcast join. Re-scanning the eval slice is
    one benchmark-sized read — far cheaper than the corpus-sized cache
    pressure a shared cached shingle relation would impose (round-3
    verdict fix)."""
    docs = load_table(spark, "documents", sf_dir)
    # Eval side: explode ONLY the eval slice. The filter precedes the
    # explode, so Catalyst pushes doc_id % 97 = 0 into the parquet scan
    # and the relation never sees a corpus-sized row count.
    eval_h = (
        docs.where(F.col("doc_id") % DECON_EVAL_MOD == 0)
        .select(F.explode(F.expr(_G8_HASHES)).alias("h"))
        .distinct()
    )
    corpus = docs.where(F.col("doc_id") % DECON_EVAL_MOD != 0)
    overlap = (
        corpus.select("doc_id", F.explode(F.expr(_G8_HASHES)).alias("h"))
        .join(F.broadcast(eval_h), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_overlap_8grams"))
    )
    return (
        corpus.select("doc_id")
        .join(overlap, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_overlap_8grams"), F.lit(0).cast("bigint")).alias(
                "n_overlap_8grams"
            ),
            (F.coalesce(F.col("n_overlap_8grams"), F.lit(0)) > 0).alias(
                "is_contaminated"
            ),
        )
    )


def _decontaminate_oracle() -> str:
    return f"""
WITH sh AS (
    SELECT doc_id, unnest({_G8_HASHES_D}) AS h FROM documents
),
eval_h AS (
    SELECT DISTINCT h FROM sh WHERE doc_id % {DECON_EVAL_MOD} = 0
),
ov AS (
    SELECT s.doc_id, count(*) AS n_overlap
    FROM sh s JOIN eval_h e USING (h)
    WHERE s.doc_id % {DECON_EVAL_MOD} <> 0
    GROUP BY s.doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(o.n_overlap, 0) AS BIGINT) AS n_overlap_8grams,
       COALESCE(o.n_overlap, 0) > 0 AS is_contaminated
FROM documents d LEFT JOIN ov o USING (doc_id)
WHERE d.doc_id % {DECON_EVAL_MOD} <> 0
"""


# ------------------------------------- cross-doc duplicated substrings

DUP_K = 16  # substring width (tokens) for cross-doc duplication analysis


def doc_dup_grams(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Per-document cross-corpus duplicated-substring fraction: the share
    of a doc's distinct 16-token grams that occur in ≥2 documents — the
    DataFrame approximation of suffix-array substring dedup analysis
    (Lee et al. 2022, "Deduplicating Training Data Makes Language Models
    Better" — public), at fixed gram width instead of maximal repeats.

    Plan shape for 100 TB: the expensive per-doc gram hashing is
    evaluated twice — once under a PARTIAL-aggregated groupBy(h) (the
    per-hash doc count combines map-side, so a boilerplate gram shared
    by every doc costs one long-key merge, not a straggler), and once as
    the probe side of a LEFT join against the duplicated-hash set. A
    window over h would evaluate the hashing once but put a universal
    gram's entire posting list in ONE window partition — a straggler AQE
    cannot split, where it CAN split a skewed join. The probe-side
    aggregation yields the total and duplicated counts together, so
    nothing is computed a third time; docs too short for any gram
    re-enter via one left join on the (tiny) doc-id column."""
    docs = load_table(spark, "documents", sf_dir)
    grams = docs.select(
        "doc_id", F.explode(F.expr(_g_hashes(DUP_K, _TOKS))).alias("h")
    )
    # grams are per-doc distinct ⇒ count per hash = containing docs
    dup_h = (
        grams.groupBy("h")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .where(F.col("n_docs") >= 2)
        .select("h", F.lit(1).alias("dup"))
    )
    per_doc = (
        grams.join(dup_h, "h", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("dup"), F.lit(0))).alias("n_dup_grams"),
        )
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0).cast("bigint")).alias(
                "n_grams"
            ),
            F.coalesce(F.col("n_dup_grams"), F.lit(0).cast("bigint")).alias(
                "n_dup_grams"
            ),
            F.when(
                F.coalesce(F.col("n_grams"), F.lit(0)) > 0,
                F.coalesce(F.col("n_dup_grams"), F.lit(0)).cast("double")
                / F.col("n_grams").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias("dup_fraction"),
        )
    )


def _dup_grams_oracle() -> str:
    g = _g_hashes_duck(DUP_K, _TOKS_D)
    return f"""
WITH grams AS (
    SELECT doc_id, unnest({g}) AS h FROM documents
),
dup_h AS (
    SELECT h FROM grams GROUP BY h HAVING count(*) >= 2
),
dup_counts AS (
    SELECT g.doc_id, count(*) AS n_dup_grams
    FROM grams g JOIN dup_h USING (h)
    GROUP BY g.doc_id
),
totals AS (
    SELECT doc_id, CAST(len({g}) AS BIGINT) AS n_grams FROM documents
)
SELECT t.doc_id,
       t.n_grams,
       CAST(COALESCE(d.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CASE WHEN t.n_grams > 0
            THEN CAST(COALESCE(d.n_dup_grams, 0) AS DOUBLE)
                 / CAST(t.n_grams AS DOUBLE)
            ELSE 0.0 END AS dup_fraction
FROM totals t LEFT JOIN dup_counts d USING (doc_id)
"""


# ------------------------------------------ content-defined chunking

CDC_W = 4        # rolling window width (tokens)
CDC_MASK = 16    # boundary when window-hash % CDC_MASK == 0 (~16-token chunks)


def doc_cdc_chunks(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Content-defined chunking: a chunk boundary falls AFTER token i
    whenever the hash of the 4-token window ending at i is ≡ 0 mod 16 —
    the rolling-hash cut rule from content-defined-chunking storage dedup
    (LBFS/rsync lineage, public), applied at token granularity. Unlike
    fixed windows (doc_chunk), an insertion early in a document shifts
    only the chunk containing it: every later boundary re-synchronizes,
    so chunk hashes stay stable for cross-corpus dedup.

    Pure per-row higher-order functions — zero shuffle at any scale; the
    fan-out (≈ n_tokens/16 chunk rows per doc) happens inside the
    projection. Deterministic md5-derived window hashes, identical in the
    DuckDB oracle. The tokenization runs ONCE per row: every later
    expression references the materialized `toks` column — embedding the
    split inside the boundary filter's lambda would re-tokenize the whole
    document per candidate position (HOF lambdas are evaluated per
    element with no cross-element CSE), turning an O(n) scan O(n²)."""
    docs = load_table(spark, "documents", sf_dir)
    win_h = HASH60_SPARK_SQL.format(
        s=f"concat_ws(' ', slice(toks, i - {CDC_W - 1}, {CDC_W}))"
    )
    bounds = (
        f"case when size(toks) >= {CDC_W} then "
        f"filter(sequence({CDC_W}, size(toks)), i -> {win_h} % {CDC_MASK} = 0)"
        f" else array() end"
    )
    base = docs.select(
        "doc_id", F.expr(_TOKS).alias("toks")
    ).select(
        "doc_id",
        "toks",
        F.expr(f"filter({bounds}, b -> b < size(toks))").alias("inner_b"),
        F.expr("size(toks)").alias("n_tok_doc"),
    ).select(
        "doc_id",
        "toks",
        F.expr(
            "concat(array(1), transform(inner_b, b -> b + 1))"
        ).alias("starts"),
        F.expr("concat(inner_b, array(n_tok_doc))").alias("ends"),
    )
    chunks = base.select(
        "doc_id",
        "toks",
        F.expr(
            "inline(transform(sequence(1, size(starts)), k -> struct("
            "k as chunk_idx,"
            " element_at(starts, k) as start_tok,"
            " element_at(ends, k) as end_tok)))"
        ),
    )
    return chunks.select(
        "doc_id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        F.col("start_tok").cast("bigint").alias("start_tok"),
        F.col("end_tok").cast("bigint").alias("end_tok"),
        (F.col("end_tok") - F.col("start_tok") + 1)
        .cast("bigint")
        .alias("n_tok"),
        F.expr(
            HASH60_SPARK_SQL.format(
                s="concat_ws(' ', slice(toks, start_tok,"
                " end_tok - start_tok + 1))"
            )
        ).alias("chunk_hash"),
    )


def _cdc_oracle() -> str:
    n = f"len({_TOKS_D})"
    win_h = HASH60_SQL.format(
        s=f"array_to_string(toks[i - {CDC_W - 1}:i], ' ')"
    )
    chunk_h = HASH60_SQL.format(
        s="array_to_string(toks[starts[k]:ends[k]], ' ')"
    )
    return f"""
WITH base AS (
    SELECT doc_id, {_TOKS_D} AS toks, {n} AS n_tok_doc FROM documents
),
b2 AS (
    SELECT doc_id, toks, n_tok_doc,
           CASE WHEN n_tok_doc >= {CDC_W} THEN
               list_filter(list_filter(generate_series({CDC_W}, n_tok_doc),
                   i -> ({win_h}) % {CDC_MASK} = 0), b -> b < n_tok_doc)
           ELSE [] END AS inner_b
    FROM base
),
b3 AS (
    SELECT doc_id, toks,
           list_prepend(1, list_transform(inner_b, b -> b + 1)) AS starts,
           list_append(inner_b, n_tok_doc) AS ends
    FROM b2
),
ch AS (
    SELECT doc_id, toks, starts, ends,
           unnest(generate_series(1, len(starts))) AS k
    FROM b3
)
SELECT doc_id,
       CAST(k AS BIGINT) AS chunk_idx,
       CAST(starts[k] AS BIGINT) AS start_tok,
       CAST(ends[k] AS BIGINT) AS end_tok,
       CAST(ends[k] - starts[k] + 1 AS BIGINT) AS n_tok,
       {chunk_h} AS chunk_hash
FROM ch
"""


# --------------------------------------------- source-level filtering

# Domain/source-level filtering thresholds (the C4/RefinedWeb-style move:
# drop whole low-quality or duplicate-heavy SOURCES, not just documents).
SOURCE_MIN_DOCS = 10
SOURCE_MIN_MEAN_SCORE_MICRO = 510_000  # mean quality ≥ 0.51, in micro-units
SOURCE_MAX_DUP_RATE_BP = 2_000        # exact-dup rate ≤ 20%, basis points


def corpus_source_stats(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Per-source corpus statistics + keep/drop verdict — domain-level
    filtering. All aggregates are integer-exact (scores summed in
    micro-units, rates compared in basis points) so the verdict and every
    reported number are bit-identical across engines and partitionings;
    the two ratio columns divide those exact integers as the final step.

    Plan: one corpus-wide fingerprint groupBy (shared shape with
    corpus_curate), then a single groupBy(source) — both
    partial-aggregated; output is |sources| rows."""
    from .dedup import _NORM
    from .text import quality_exprs

    e = quality_exprs("spark")
    docs = load_table(spark, "documents", sf_dir)
    d = docs.select(
        "doc_id",
        "source",
        F.expr(f"md5({_NORM})").alias("fingerprint"),
        F.expr(e["n"]).cast("bigint").alias("n_tokens"),
        F.expr(f"cast(round(({e['score']}) * 1000000) as bigint)").alias(
            "score_micro"
        ),
    )
    canon = d.groupBy("fingerprint").agg(
        F.min("doc_id").alias("canonical_doc_id")
    )
    per_source = (
        d.join(canon, "fingerprint")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(F.col("doc_id") == F.col("canonical_doc_id"), 1)
                .otherwise(0)
            ).alias("n_canonical"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("score_micro").alias("sum_score_micro"),
        )
    )
    keep = (
        (F.col("n_docs") >= SOURCE_MIN_DOCS)
        & (
            F.col("sum_score_micro")
            >= F.lit(SOURCE_MIN_MEAN_SCORE_MICRO) * F.col("n_docs")
        )
        & (
            (F.col("n_docs") - F.col("n_canonical")) * 10_000
            <= F.lit(SOURCE_MAX_DUP_RATE_BP) * F.col("n_docs")
        )
    )
    return per_source.select(
        "source",
        "n_docs",
        "n_canonical",
        "total_tokens",
        "sum_score_micro",
        (F.col("sum_score_micro").cast("double") / (F.col("n_docs") * 1_000_000))
        .alias("mean_quality"),
        (
            (F.col("n_docs") - F.col("n_canonical")).cast("double")
            / F.col("n_docs")
        ).alias("exact_dup_rate"),
        keep.alias("keep_source"),
    )


def _source_stats_oracle() -> str:
    from .dedup import _NORM_D
    from .text import quality_exprs

    e = quality_exprs("duck")
    return f"""
WITH d AS (
    SELECT doc_id, source, md5({_NORM_D}) AS fingerprint,
           CAST({e['n']} AS BIGINT) AS n_tokens,
           CAST(round(({e['score']}) * 1000000) AS BIGINT) AS score_micro
    FROM documents
),
canon AS (
    SELECT fingerprint, min(doc_id) AS canonical_doc_id FROM d GROUP BY 1
),
per_source AS (
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN doc_id = canonical_doc_id THEN 1 ELSE 0 END)
               AS BIGINT) AS n_canonical,
           CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
           CAST(sum(score_micro) AS BIGINT) AS sum_score_micro
    FROM d JOIN canon USING (fingerprint)
    GROUP BY source
)
SELECT source, n_docs, n_canonical, total_tokens, sum_score_micro,
       CAST(sum_score_micro AS DOUBLE) / (n_docs * 1000000)
           AS mean_quality,
       CAST(n_docs - n_canonical AS DOUBLE) / n_docs AS exact_dup_rate,
       n_docs >= {SOURCE_MIN_DOCS}
           AND sum_score_micro >= {SOURCE_MIN_MEAN_SCORE_MICRO} * n_docs
           AND (n_docs - n_canonical) * 10000
               <= {SOURCE_MAX_DUP_RATE_BP} * n_docs
           AS keep_source
FROM per_source
"""


# ------------------------------------------------- sequence packing

PACK_CTX_TOKENS = 256  # fixed training-context width (tokens)


def doc_pack(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Concat-then-split sequence packing: per language, documents are
    laid end-to-end in doc_id order and cut into fixed 256-token
    contexts; each doc reports its context id, offset, and whether it
    spans a context boundary.

    The running offset is a window cumsum PARTITIONED by language — the
    packing unit — so parallelism is per-language, not single-partition.
    At 100 TB a giant language is additionally sharded by a stable
    doc_id-range sub-key (offsets then compose per shard exactly like
    per-language offsets compose here)."""
    docs = load_table(spark, "documents", sf_dir)
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    base = docs.select(
        "doc_id", "lang", F.expr(f"size({_TOKS})").cast("bigint").alias("n_tokens")
    ).withColumn(
        "cum_before",
        F.coalesce(F.sum("n_tokens").over(w), F.lit(0).cast("bigint")),
    )
    ctx = F.col("cum_before")
    # `div` is Spark's INTEGER division on bigints — exact at any cumsum
    # magnitude, matching the oracle's `//`. (A double-division round-trip
    # is exact only below 2^53, which a 100 TB per-language cumsum can
    # exceed — round-4 advisor fix.)
    return base.select(
        "doc_id",
        "lang",
        "n_tokens",
        F.expr(f"cum_before div {PACK_CTX_TOKENS}").alias("ctx_id"),
        (ctx % PACK_CTX_TOKENS).alias("ctx_offset"),
        (
            (F.col("n_tokens") > 0)
            & (
                F.expr(
                    f"(cum_before + n_tokens - 1) div {PACK_CTX_TOKENS}"
                )
                > F.expr(f"cum_before div {PACK_CTX_TOKENS}")
            )
        ).alias("spans_boundary"),
    )


def _pack_oracle() -> str:
    return f"""
WITH base AS (
    SELECT doc_id, lang,
           CAST(len({_TOKS_D}) AS BIGINT) AS n_tokens,
           CAST(COALESCE(sum(len({_TOKS_D})) OVER (
               PARTITION BY lang ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
               AS cum_before
    FROM documents
)
SELECT doc_id, lang, n_tokens,
       cum_before // {PACK_CTX_TOKENS} AS ctx_id,
       cum_before % {PACK_CTX_TOKENS} AS ctx_offset,
       n_tokens > 0 AND
           (cum_before + n_tokens - 1) // {PACK_CTX_TOKENS}
           > cum_before // {PACK_CTX_TOKENS} AS spans_boundary
FROM base
"""


# ------------------------------------------ end-to-end keep verdict

SEG_MAX_DUP_HALF = True  # keep a doc while ≥50% of its segments are unique


def corpus_pipeline_verdict(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """The composed end-to-end curation decision — every per-document
    gate of the preparation pipeline chained into one final keep/drop
    table, the artifact an actual training-data run materializes before
    tokenization:

    * ``keep_curate`` — exact-dedup canonical + quality band + token
      bounds (corpus_curate);
    * ``keep_decontam`` — no 8-gram collision with the eval slice
      (corpus_decontaminate); the eval holdout itself is never a
      training candidate (``is_eval_holdout``);
    * ``keep_segment`` — ≥50% of the doc's 8-token segments survive
      corpus-wide segment dedup (corpus_segment_dedup);
    * ``keep_sampled`` — the doc's salted hash falls under its source's
      α-temperature rate (corpus_mix_sample);
    * ``keep`` — the conjunction.

    Pure operator reuse: each gate is the REGISTERED operator's plan as
    a subtree (so this row also verifies their composition), joined on
    doc_id; the oracle composes the same member oracles. Costs one
    pass per gate — at 100 TB a production run would fuse the gates
    into one pass over shared scans, which Catalyst already does for
    the scan-level projections here."""
    docs = load_table(spark, "documents", sf_dir)
    base = docs.select(
        "doc_id",
        "source",
        (F.col("doc_id") % DECON_EVAL_MOD == 0).alias("is_eval_holdout"),
    )
    from .corpus import corpus_curate

    cur = corpus_curate(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("keep_curate")
    )
    dec = corpus_decontaminate(spark, sf_dir).select(
        "doc_id", (~F.col("is_contaminated")).alias("keep_decontam")
    )
    seg = corpus_segment_dedup(spark, sf_dir).select(
        "doc_id",
        (F.col("n_dropped_segments") * 2 <= F.col("n_segments")).alias(
            "keep_segment"
        ),
    )
    rates = corpus_mix_sample(spark, sf_dir).select("source", "rate_bp")
    bucket = (
        f"cast(conv(substring(md5(concat('{_MIX_SALT}',"
        f" cast(doc_id as string))), 1, 15), 16, 10) as long) % {_MIX_MOD}"
    )
    sampled = (
        base.join(F.broadcast(rates), "source")
        .select(
            "doc_id",
            (F.expr(bucket) < F.col("rate_bp")).alias("keep_sampled"),
        )
    )
    out = (
        base.join(cur, "doc_id", "left")
        .join(dec, "doc_id", "left")
        .join(seg, "doc_id", "left")
        .join(sampled, "doc_id", "left")
        .select(
            "doc_id",
            "is_eval_holdout",
            F.coalesce("keep_curate", F.lit(False)).alias("keep_curate"),
            # eval-slice docs have no decontamination row: never kept
            F.coalesce("keep_decontam", F.lit(False)).alias("keep_decontam"),
            F.coalesce("keep_segment", F.lit(False)).alias("keep_segment"),
            F.coalesce("keep_sampled", F.lit(False)).alias("keep_sampled"),
        )
    )
    return out.withColumn(
        "keep",
        F.col("keep_curate")
        & F.col("keep_decontam")
        & F.col("keep_segment")
        & F.col("keep_sampled"),
    )


def _pipeline_verdict_oracle() -> str:
    from .corpus import ORACLES as _CORPUS_ORACLES

    bucket = (
        f"CAST('0x' || substr(md5('{_MIX_SALT}'"
        f" || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % {_MIX_MOD}"
    )
    return f"""
WITH cur AS (
    SELECT doc_id, keep AS keep_curate
    FROM ({_CORPUS_ORACLES["corpus_curate"]}) t
),
dec AS (
    SELECT doc_id, NOT is_contaminated AS keep_decontam
    FROM ({_decontaminate_oracle()}) t
),
seg AS (
    SELECT doc_id, n_dropped_segments * 2 <= n_segments AS keep_segment
    FROM ({_segment_dedup_oracle()}) t
),
rates AS (
    SELECT source, rate_bp FROM ({_mix_sample_oracle()}) t
),
base AS (
    SELECT d.doc_id, d.source, d.doc_id % {DECON_EVAL_MOD} = 0
        AS is_eval_holdout,
        {bucket} < r.rate_bp AS keep_sampled
    FROM documents d JOIN rates r ON d.source = r.source
),
assembled AS (
    SELECT b.doc_id, b.is_eval_holdout,
           COALESCE(c.keep_curate, FALSE) AS keep_curate,
           COALESCE(x.keep_decontam, FALSE) AS keep_decontam,
           COALESCE(s.keep_segment, FALSE) AS keep_segment,
           COALESCE(b.keep_sampled, FALSE) AS keep_sampled
    FROM base b
    LEFT JOIN cur c USING (doc_id)
    LEFT JOIN dec x USING (doc_id)
    LEFT JOIN seg s USING (doc_id)
)
SELECT *, keep_curate AND keep_decontam AND keep_segment AND keep_sampled
    AS keep
FROM assembled
"""


# --------------------------------------------- BPE merge training

BPE_ROUNDS = 3  # learned merge rules (unrolled in the oracle)


def _bpe_fold_expr() -> str:
    """Greedy left-to-right non-overlapping pair merge over a symbol
    array (Spark HOF fold with a struct accumulator): the core step of
    byte-pair-encoding tokenizer training (Sennrich et al. 2016,
    public). `l`/`r` resolve to the broadcast top-pair columns."""
    return (
        "aggregate(syms,"
        " named_struct('out', cast(array() as array<string>),"
        " 'carry', cast(null as string)),"
        " (acc, s) -> case"
        " when acc.carry is null then named_struct('out', acc.out, 'carry', s)"
        " when acc.carry = l and s = r then named_struct("
        "'out', array_append(acc.out, concat(l, r)),"
        " 'carry', cast(null as string))"
        " else named_struct('out', array_append(acc.out, acc.carry),"
        " 'carry', s) end,"
        " acc -> case when acc.carry is null then acc.out"
        " else array_append(acc.out, acc.carry) end)"
    )


def bpe_train_merges(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Learn the first 3 BPE merge rules from the corpus — tokenizer
    training as DataFrame algebra. Character-level byte-pair encoding
    (Sennrich et al. 2016): count adjacent symbol pairs across the
    distinct-word table weighted by corpus frequency, merge the most
    frequent pair everywhere (greedy left-to-right, non-overlapping),
    repeat. Ties break deterministically on (count desc, left, right).

    Plan shape for 100 TB: the ONLY corpus-sized work is the initial
    word count (one partial-aggregated explode); every training round
    then runs on the distinct-word table (vocabulary-sized, millions of
    rows at web scale, not trillions) — pair counting is a
    partial-aggregated groupBy, the winning pair broadcasts (1 row),
    and the merge is a per-row fold. The driver-side loop builds K
    chained lazy plans (no collect between rounds), the same iterative
    seam as dedup_clusters.

    The DuckDB oracle is a genuinely independent implementation: the
    greedy merge is expressed positionally (match-run grouping + parity
    within each run) instead of a fold."""
    _words, tops = _bpe_chain(spark, sf_dir)
    rounds = [
        top.select(
            F.lit(k).alias("round"),
            F.col("l").alias("merge_left"),
            F.col("r").alias("merge_right"),
            "pair_count",
            F.concat("l", "r").alias("merged_symbol"),
        )
        for k, top in enumerate(tops, start=1)
    ]
    out = rounds[0]
    for r in rounds[1:]:
        out = out.unionByName(r)
    return out


def _bpe_chain(spark, sf_dir):
    """The shared training chain: (final segmented word table with
    columns word_id/cnt/syms, list of per-round winning-pair frames)."""
    docs = load_table(spark, "documents", sf_dir)
    words = (
        docs.select(F.explode(F.expr(_TOKS)).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w").alias("word_id"),
            "cnt",
            F.expr(
                "case when length(w) >= 1 then"
                " transform(sequence(1, length(w)), i -> substring(w, i, 1))"
                " else array() end"
            ).alias("syms"),
        )
    )
    fold = _bpe_fold_expr()
    tops = []
    for _k in range(1, BPE_ROUNDS + 1):
        pairs = (
            words.select(
                F.expr(
                    "inline(case when size(syms) >= 2 then"
                    " transform(sequence(1, size(syms) - 1),"
                    " i -> struct(element_at(syms, i) as l,"
                    " element_at(syms, i + 1) as r))"
                    " else array() end)"
                ),
                "cnt",
            )
            .groupBy("l", "r")
            .agg(F.sum("cnt").alias("pair_count"))
        )
        top = pairs.orderBy(F.desc("pair_count"), "l", "r").limit(1)
        tops.append(top)
        words = (
            words.crossJoin(F.broadcast(top))
            .select("word_id", "cnt", F.expr(fold).alias("syms"))
        )
    return words, tops


def bpe_segment_stats(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Apply the learned BPE merges back to the corpus — the tokenizer
    APPLY phase completing :func:`bpe_train_merges`' train phase. Every
    document reports its whitespace-token count, its token count under
    the learned 3-merge vocabulary, character count, and the resulting
    tokens-per-char ratio (the compression a tokenizer buys).

    Plan shape: segmentation happens ONCE per distinct word (the
    vocabulary-sized trained table), then a broadcast join attaches
    per-word BPE lengths to the corpus's exploded words and one
    partial-aggregated groupBy(doc_id) sums them — the corpus is never
    re-segmented row by row. At web scale the word join falls back to
    an AQE hash join (no forced broadcast)."""
    segmented, _tops = _bpe_chain(spark, sf_dir)
    word_len = segmented.select(
        "word_id",
        F.expr("size(syms)").cast("bigint").alias("n_bpe"),
        F.length("word_id").cast("bigint").alias("n_chars_w"),
    )
    docs = load_table(spark, "documents", sf_dir)
    doc_words = docs.select(
        "doc_id", F.explode(F.expr(_TOKS)).alias("word_id")
    )
    per_doc = (
        doc_words.join(word_len, "word_id")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("n_bpe").alias("n_bpe_tokens"),
            F.sum("n_chars_w").alias("n_chars"),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_tokens",
        "n_bpe_tokens",
        "n_chars",
        F.when(
            F.col("n_chars") > 0,
            F.col("n_bpe_tokens").cast("double")
            / F.col("n_chars").cast("double"),
        )
        .otherwise(F.lit(0.0))
        .alias("bpe_per_char"),
    )


def _bpe_round_sql(k: int) -> str:
    """One unrolled training round (DuckDB): pair counts → top pair →
    positional greedy merge (match runs + in-run parity)."""
    return f"""
pairs{k} AS (
    SELECT w.syms[t.i] AS l, w.syms[t.i + 1] AS r,
           CAST(sum(w.cnt) AS BIGINT) AS pair_count
    FROM words{k} w, unnest(generate_series(1, len(w.syms) - 1)) t(i)
    WHERE len(w.syms) >= 2
    GROUP BY 1, 2
),
top{k} AS (
    SELECT l, r, pair_count FROM pairs{k}
    ORDER BY pair_count DESC, l, r LIMIT 1
),
ex{k} AS (
    SELECT w.word_id, w.cnt, t.i AS i, w.syms[t.i] AS s,
           len(w.syms) AS n
    FROM words{k} w, unnest(generate_series(1, len(w.syms))) t(i)
),
m{k} AS (
    SELECT e.*, t.l, t.r,
           (e.i < e.n AND e.s = t.l
            AND lead(e.s) OVER (PARTITION BY e.word_id ORDER BY e.i) = t.r)
               AS matched
    FROM ex{k} e, top{k} t
),
g{k} AS (
    SELECT *, CASE WHEN matched THEN
        i - row_number() OVER (PARTITION BY word_id, matched ORDER BY i)
        END AS grp
    FROM m{k}
),
st{k} AS (
    SELECT *, COALESCE(matched AND
        (i - min(i) OVER (PARTITION BY word_id, grp)) % 2 = 0, FALSE)
        AS is_start
    FROM g{k}
),
em{k} AS (
    SELECT *, lag(is_start, 1, FALSE)
        OVER (PARTITION BY word_id ORDER BY i) AS prev_start
    FROM st{k}
),
words{k + 1} AS (
    SELECT word_id, cnt,
           COALESCE(list(CASE WHEN is_start THEN l || r ELSE s END
               ORDER BY i) FILTER (WHERE NOT prev_start), []) AS syms
    FROM em{k}
    GROUP BY word_id, cnt
)"""


def _bpe_segment_oracle() -> str:
    rounds = ",".join(_bpe_round_sql(k) for k in range(1, BPE_ROUNDS + 1))
    final = BPE_ROUNDS + 1
    return f"""
WITH wordcount AS (
    SELECT t.word AS word_id, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest({_TOKS_D}) AS word FROM documents) t
    GROUP BY 1
),
words1 AS (
    SELECT word_id, cnt,
           CASE WHEN length(word_id) >= 1 THEN
               list_transform(generate_series(1, length(word_id)),
                   i -> substr(word_id, i, 1))
           ELSE [] END AS syms
    FROM wordcount
),
{rounds},
word_len AS (
    SELECT word_id, CAST(len(syms) AS BIGINT) AS n_bpe,
           CAST(length(word_id) AS BIGINT) AS n_chars_w
    FROM words{final}
),
doc_words AS (
    SELECT doc_id, unnest({_TOKS_D}) AS word_id FROM documents
),
per_doc AS (
    SELECT d.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(w.n_bpe) AS BIGINT) AS n_bpe_tokens,
           CAST(sum(w.n_chars_w) AS BIGINT) AS n_chars
    FROM doc_words d JOIN word_len w USING (word_id)
    GROUP BY 1
)
SELECT doc_id, n_tokens, n_bpe_tokens, n_chars,
       CASE WHEN n_chars > 0
            THEN CAST(n_bpe_tokens AS DOUBLE) / CAST(n_chars AS DOUBLE)
            ELSE 0.0 END AS bpe_per_char
FROM per_doc
"""


def _bpe_oracle() -> str:
    rounds = ",".join(_bpe_round_sql(k) for k in range(1, BPE_ROUNDS + 1))
    finals = "\nUNION ALL\n".join(
        f"SELECT {k} AS round, l AS merge_left, r AS merge_right,"
        f" pair_count, l || r AS merged_symbol FROM top{k}"
        for k in range(1, BPE_ROUNDS + 1)
    )
    return f"""
WITH wordcount AS (
    SELECT t.word AS word_id, CAST(count(*) AS BIGINT) AS cnt
    FROM (SELECT unnest({_TOKS_D}) AS word FROM documents) t
    GROUP BY 1
),
words1 AS (
    SELECT word_id, cnt,
           CASE WHEN length(word_id) >= 1 THEN
               list_transform(generate_series(1, length(word_id)),
                   i -> substr(word_id, i, 1))
           ELSE [] END AS syms
    FROM wordcount
),
{rounds}
{finals}
"""


# ------------------------------------------------- int8 quantization


def emb_quantize(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Symmetric int8 scalar quantization per embedding vector with exact
    reconstruction-error metrics.

    Inputs are first quantized to integer micro-units (float→double
    widening is exact, round(x·1e6)→int64 — the same determinism trick as
    dedup_embedding_cosine); scale = max|x|, code = round(x·127/scale).
    The error metric |127·x − code·scale| stays integer, so max/sum
    aggregate order-free and both engines agree bit-for-bit. Pure
    higher-order-function scan: zero shuffle at any scale."""
    emb = load_table(spark, "embeddings", sf_dir)
    e = f"transform(embedding, x -> cast(round(cast(x as double) * {EMB_SCALE}) as bigint))"
    q = emb.select(
        "vec_id",
        F.expr(e).alias("e"),
    ).withColumn(
        "max_abs_micro",
        F.expr("aggregate(e, 0L, (acc, x) -> greatest(acc, abs(x)))"),
    )
    # int8 code per dim: round on an exactly-representable double ratio.
    # greatest(scale, 1) makes the all-zero vector well-defined (codes and
    # errors all 0) without a NaN-producing 0/0 in either engine.
    codes = (
        "transform(e, x -> cast(round(cast(x * 127 as double)"
        " / cast(greatest(max_abs_micro, 1L) as double)) as bigint))"
    )
    err = (
        f"zip_with(e, {codes}, (x, c) -> abs(x * 127 - c * max_abs_micro))"
    )
    return q.select(
        "vec_id",
        F.expr("size(e)").alias("n_dims"),
        "max_abs_micro",
        F.expr(f"aggregate({err}, 0L, (acc, x) -> greatest(acc, x))").alias(
            "max_abs_err_q127"
        ),
        F.expr(f"aggregate({err}, 0L, (acc, x) -> acc + x)").alias(
            "sum_abs_err_q127"
        ),
    )


def _quantize_oracle() -> str:
    e = (
        "list_transform(embedding,"
        f" x -> CAST(round(CAST(x AS DOUBLE) * {EMB_SCALE}) AS BIGINT))"
    )
    return f"""
WITH q AS (
    SELECT vec_id, {e} AS e,
           CAST(list_max(list_transform({e}, x -> abs(x))) AS BIGINT)
               AS max_abs_micro
    FROM embeddings
),
coded AS (
    SELECT vec_id, e, max_abs_micro,
           list_transform(list_zip(e,
               list_transform(e, x -> CAST(round(CAST(x * 127 AS DOUBLE)
                   / CAST(greatest(max_abs_micro, 1) AS DOUBLE)) AS BIGINT))),
               p -> abs(p[1] * 127 - p[2] * max_abs_micro)) AS err
    FROM q
)
SELECT vec_id,
       CAST(len(e) AS INTEGER) AS n_dims,
       max_abs_micro,
       CAST(COALESCE(list_max(err), 0) AS BIGINT) AS max_abs_err_q127,
       CAST(COALESCE(list_sum(err), 0) AS BIGINT) AS sum_abs_err_q127
FROM coded
"""


# ------------------------------------------ random-projection reduce


def _proj_dots(dialect: str) -> list[str]:
    """One integer dot-product expression per fixed ±1 projection row
    (over the micro-quantized embedding `e`), per dialect."""
    from .common import PROJ_PLANES

    out = []
    for plane in PROJ_PLANES:
        lits = ", ".join(str(v) for v in plane)
        if dialect == "spark":
            out.append(
                f"aggregate(zip_with(e, array({lits}),"
                " (x, r) -> x * r), 0L, (acc, x) -> acc + x)"
            )
        else:
            out.append(
                f"CAST(list_sum(list_transform(list_zip(e, [{lits}]),"
                " p -> p[1] * p[2])) AS BIGINT)"
            )
    return out


def emb_project(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Random-projection dimensionality reduction 64 → 16 with the
    database-friendly ±1 matrix of Achlioptas (2001, public) — the cheap
    JL-preserving reduce used before clustering/ANN when full-dim
    embeddings are too wide to shuffle. Embeddings are micro-quantized
    to int64 first (the repo's standard determinism move), so every
    projected coordinate and both norms are exact integers; the JL
    distortion ratio ||Rx||² / (16·||x||²) divides those integers as the
    final step and concentrates near 1.

    Pure higher-order-function scan — zero shuffle at any scale; the
    16×64 matrix is a fixed literal in both engines (like the minhash
    coefficients and LSH planes)."""
    from .common import PROJ_DIM

    emb = load_table(spark, "embeddings", sf_dir)
    e = (
        "transform(embedding, x -> cast(round(cast(x as double)"
        f" * {EMB_SCALE}) as bigint))"
    )
    dots = _proj_dots("spark")
    base = emb.select(
        "vec_id", F.expr(e).alias("e")
    ).select(
        "vec_id",
        F.expr("size(e)").alias("n_dims"),
        F.expr("aggregate(e, 0L, (acc, x) -> acc + x * x)").alias(
            "orig_norm_q"
        ),
        *[F.expr(d).alias(f"p{j}") for j, d in enumerate(dots[:4])],
        F.expr(
            "("
            + " + ".join(f"({d}) * ({d})" for d in dots)
            + ")"
        ).alias("proj_norm_q"),
    )
    return base.select(
        "vec_id",
        "n_dims",
        "orig_norm_q",
        "p0",
        "p1",
        "p2",
        "p3",
        "proj_norm_q",
        F.when(F.col("orig_norm_q") > 0,
               F.col("proj_norm_q").cast("double")
               / (F.lit(float(PROJ_DIM)) * F.col("orig_norm_q").cast("double")))
        .otherwise(F.lit(0.0))
        .alias("jl_distortion"),
    )


def _project_oracle() -> str:
    from .common import PROJ_DIM

    e = (
        "list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE)"
        f" * {EMB_SCALE}) AS BIGINT))"
    )
    dots = _proj_dots("duck")
    proj_norm = " + ".join(f"({d}) * ({d})" for d in dots)
    p_cols = ",\n       ".join(
        f"{d} AS p{j}" for j, d in enumerate(dots[:4])
    )
    return f"""
WITH q AS (
    SELECT vec_id, {e} AS e FROM embeddings
)
SELECT vec_id,
       CAST(len(e) AS INTEGER) AS n_dims,
       CAST(list_sum(list_transform(e, x -> x * x)) AS BIGINT)
           AS orig_norm_q,
       {p_cols},
       CAST({proj_norm} AS BIGINT) AS proj_norm_q,
       CASE WHEN list_sum(list_transform(e, x -> x * x)) > 0
            THEN CAST({proj_norm} AS DOUBLE)
                 / ({PROJ_DIM}.0 * CAST(list_sum(list_transform(e,
                     x -> x * x)) AS DOUBLE))
            ELSE 0.0 END AS jl_distortion
FROM q
"""


# --------------------------------------------- segment-level dedup

SEG_W = 8  # non-overlapping segment width (tokens)
_SEG_SLICE_D = f"toks[k * {SEG_W} + 1 : k * {SEG_W} + {SEG_W}]"


def corpus_segment_dedup(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Sub-document exact dedup: the corpus is cut into non-overlapping
    8-token segments and every segment whose normalized text already
    occurred earlier in the corpus (first occurrence = min (doc_id,
    seg_idx)) is dropped — the line/paragraph-level dedup pass from
    CCNet (Wenzek et al. 2019, public), at fixed segment granularity
    because the synthetic corpus has no line structure. Output is the
    per-document decision summary plus the md5 of the document's kept
    text, so the op is fully hash-verifiable.

    Plan shape for 100 TB: one partial-aggregated groupBy on the 60-bit
    segment hash computes each segment's first occurrence (min over a
    (doc_id, seg_idx) struct — combines map-side, so a boilerplate
    segment occurring everywhere costs one long-key merge, not a
    straggler), then one hash-join back and one per-doc aggregation.
    The in-doc reassembly (sort kept segments, concat, md5) happens
    inside the per-doc aggregate — no window, no second corpus pass."""
    docs = load_table(spark, "documents", sf_dir)
    segs_expr = (
        f"case when size({_TOKS}) >= 1 then "
        f"transform(sequence(0, cast(ceil(size({_TOKS}) / {SEG_W}.0) as int) - 1),"
        f" k -> struct(k as seg_idx,"
        f" concat_ws(' ', slice({_TOKS}, k * {SEG_W} + 1, {SEG_W})) as seg))"
        " else array() end"
    )
    segs = docs.select("doc_id", F.expr(f"inline({segs_expr})")).withColumn(
        "h", F.expr(HASH60_SPARK_SQL.format(s="seg"))
    )
    first = segs.groupBy("h").agg(
        F.min(F.struct("doc_id", "seg_idx")).alias("first")
    )
    j = segs.join(first, "h")
    kept = (F.col("doc_id") == F.col("first.doc_id")) & (
        F.col("seg_idx") == F.col("first.seg_idx")
    )
    per_doc = j.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum(kept.cast("int")).cast("bigint").alias("n_kept_segments"),
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(
                        F.collect_list(F.when(kept, F.struct("seg_idx", "seg")))
                    ),
                    lambda x: x["seg"],
                ),
            )
        ).alias("kept_md5"),
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_segments"), F.lit(0).cast("bigint")).alias(
                "n_segments"
            ),
            F.coalesce(
                F.col("n_kept_segments"), F.lit(0).cast("bigint")
            ).alias("n_kept_segments"),
            (
                F.coalesce(F.col("n_segments"), F.lit(0))
                - F.coalesce(F.col("n_kept_segments"), F.lit(0))
            ).cast("bigint").alias("n_dropped_segments"),
            F.coalesce(F.col("kept_md5"), F.md5(F.lit(""))).alias("kept_md5"),
        )
    )


def _segment_dedup_oracle() -> str:
    # Independent derivation: first occurrence via a window rank instead
    # of the Spark side's partial-aggregated struct-min.
    h = HASH60_SQL.format(s="seg")
    return f"""
WITH base AS (
    SELECT doc_id, {_TOKS_D} AS toks FROM documents
),
ks AS (
    SELECT doc_id, toks,
           unnest(CASE WHEN len(toks) >= 1 THEN generate_series(0,
               CAST(ceil(len(toks) / {SEG_W}.0) AS INT) - 1) ELSE [] END) AS k
    FROM base
),
segs AS (
    SELECT doc_id, k AS seg_idx,
           array_to_string({_SEG_SLICE_D}, ' ') AS seg
    FROM ks
),
fh AS (
    SELECT doc_id, seg_idx, seg,
           row_number() OVER (PARTITION BY {h}
                              ORDER BY doc_id, seg_idx) AS rn
    FROM segs
),
per_doc AS (
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_segments,
           CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_kept_segments,
           md5(COALESCE(string_agg(seg, ' ' ORDER BY seg_idx)
               FILTER (WHERE rn = 1), '')) AS kept_md5
    FROM fh GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(p.n_segments, 0) AS BIGINT) AS n_segments,
       CAST(COALESCE(p.n_kept_segments, 0) AS BIGINT) AS n_kept_segments,
       CAST(COALESCE(p.n_segments, 0) - COALESCE(p.n_kept_segments, 0)
           AS BIGINT) AS n_dropped_segments,
       COALESCE(p.kept_md5, md5('')) AS kept_md5
FROM documents d LEFT JOIN per_doc p USING (doc_id)
"""


# ------------------------------------------- temperature source mixing

MIX_ALPHA_NOTE = "alpha = 0.5 (square-root temperature sampling)"
_MIX_SALT = "mix-v1:"
_MIX_MOD = 10_000


def corpus_mix_sample(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Temperature-based source mixing: per-source sampling rates
    proportional to n_docs^0.5 — the α-sampling used to rebalance
    over-represented sources in multilingual/multi-source pretraining
    (mC4 / XLM-R α-temperature sampling, public). The overall budget is
    half the corpus; each source's target is its share of the
    sqrt-weight mass, its rate is clamped to 100%, and membership is
    the deterministic salted-hash bucket test (same discipline as
    corpus_sample_stratified — reproducible across runs/engines,
    stable under corpus growth).

    Integer-exact across engines: weight = floor(sqrt(n)·1000) (IEEE
    sqrt and multiply are correctly rounded, so both engines floor the
    identical double), and every later step is bigint arithmetic.
    Plan: one groupBy(source) (|sources| rows), a broadcast of the tiny
    rate table back onto the corpus scan, one filtered re-count."""
    docs = load_table(spark, "documents", sf_dir)
    per_source = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs")
    ).withColumn(
        "weight_milli",
        F.floor(F.sqrt(F.col("n_docs").cast("double")) * 1000).cast("bigint"),
    )
    totals = per_source.agg(
        F.sum("n_docs").alias("total_docs"),
        F.sum("weight_milli").alias("sum_weight_milli"),
    )
    rates = per_source.crossJoin(F.broadcast(totals)).select(
        "source",
        "n_docs",
        "weight_milli",
        F.expr("(total_docs div 2) * weight_milli div sum_weight_milli")
        .alias("target_docs"),
    ).withColumn(
        "rate_bp",
        F.least(
            F.lit(10_000).cast("bigint"),
            F.expr("target_docs * 10000 div n_docs"),
        ),
    )
    bucket = (
        f"cast(conv(substring(md5(concat('{_MIX_SALT}',"
        f" cast(doc_id as string))), 1, 15), 16, 10) as long) % {_MIX_MOD}"
    )
    sampled = (
        docs.select("source", F.expr(bucket).alias("bucket"))
        .join(F.broadcast(rates.select("source", "rate_bp")), "source")
        .where(F.col("bucket") < F.col("rate_bp"))
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_sampled"))
    )
    return rates.join(sampled, "source", "left").select(
        "source",
        "n_docs",
        "weight_milli",
        "target_docs",
        "rate_bp",
        F.coalesce(F.col("n_sampled"), F.lit(0).cast("bigint")).alias(
            "n_sampled"
        ),
        (
            F.coalesce(F.col("n_sampled"), F.lit(0)).cast("double")
            / F.col("n_docs").cast("double")
        ).alias("realized_rate"),
    )


def _mix_sample_oracle() -> str:
    bucket = (
        f"CAST('0x' || substr(md5('{_MIX_SALT}'"
        f" || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) % {_MIX_MOD}"
    )
    return f"""
WITH per_source AS (
    SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(floor(sqrt(CAST(count(*) AS DOUBLE)) * 1000) AS BIGINT)
               AS weight_milli
    FROM documents GROUP BY source
),
totals AS (
    SELECT CAST(sum(n_docs) AS BIGINT) AS total_docs,
           CAST(sum(weight_milli) AS BIGINT) AS sum_weight_milli
    FROM per_source
),
rates AS (
    SELECT source, n_docs, weight_milli,
           (total_docs // 2) * weight_milli // sum_weight_milli
               AS target_docs,
           least(CAST(10000 AS BIGINT),
               ((total_docs // 2) * weight_milli // sum_weight_milli)
               * 10000 // n_docs) AS rate_bp
    FROM per_source, totals
),
sampled AS (
    SELECT d.source, CAST(count(*) AS BIGINT) AS n_sampled
    FROM documents d JOIN rates r ON d.source = r.source
    WHERE {bucket} < r.rate_bp
    GROUP BY d.source
)
SELECT r.source, r.n_docs, r.weight_milli,
       CAST(r.target_docs AS BIGINT) AS target_docs,
       CAST(r.rate_bp AS BIGINT) AS rate_bp,
       CAST(COALESCE(s.n_sampled, 0) AS BIGINT) AS n_sampled,
       CAST(COALESCE(s.n_sampled, 0) AS DOUBLE) / CAST(r.n_docs AS DOUBLE)
           AS realized_rate
FROM rates r LEFT JOIN sampled s ON r.source = s.source
"""


ORACLES: dict[str, str] = {
    "corpus_decontaminate": _decontaminate_oracle(),
    "doc_pack": _pack_oracle(),
    "emb_quantize": _quantize_oracle(),
    "doc_dup_grams": _dup_grams_oracle(),
    "corpus_source_stats": _source_stats_oracle(),
    "doc_cdc_chunks": _cdc_oracle(),
    "corpus_segment_dedup": _segment_dedup_oracle(),
    "corpus_mix_sample": _mix_sample_oracle(),
    "emb_project": _project_oracle(),
    "bpe_train_merges": _bpe_oracle(),
    "bpe_segment_stats": _bpe_segment_oracle(),
    "corpus_pipeline_verdict": _pipeline_verdict_oracle(),
}
