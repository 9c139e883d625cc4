"""The driver-facing catalog: named queries + DuckDB oracle SQL.

Every implemented operator from SURVEY.md §2 appears here as a
``(spark, sf_dir) -> DataFrame`` callable with a matching oracle SQL
string (omitted only for genuinely non-SQL-expressible operators, which
the driver then checks rows-only). Registration happens in layers —
jaffle pipeline models first, then standalone operator-family queries,
then beyond-reference extensions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..models import marts_analytics, marts_core, marts_segmentation
from .oracle_jaffle import jaffle_sql

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def register(name: str, fn: QueryFn, oracle_sql: str | None = None) -> None:
    QUERIES[name] = fn
    if oracle_sql is not None:
        ORACLE[name] = oracle_sql


# REGISTRY ORDER MATTERS: the driver records correctness for at most the
# FIRST 50 entries (round-1 record = exactly the first 50 of 52, truncated
# mid-catalog). Per-model staging/intermediate/rollup checks are therefore
# consolidated into full-content digest queries (queries/digests.py — each
# digest hash-verifies every column of every row of its model group), and
# the total registry is kept ≤ 50.

# --------------------------------------------------------- jaffle pipeline
_JAFFLE_MODELS: dict[str, Callable] = {
    # core marts (A11/J2/J3/J1/A1-A4/W1/F7/F8)
    "jaffle_order_items": marts_core.order_items,
    "jaffle_orders": marts_core.orders,
    "jaffle_customers": marts_core.customers,
    # analytics marts (J4/J5/A5-A10/W2/F6/F7/F9/F11)
    "jaffle_products": marts_analytics.products,
    "jaffle_supplies": marts_analytics.supplies,
    "jaffle_locations": marts_analytics.locations,
    # segmentation & time marts (S5/F3/F4/F7/F10/A8/J6/W3/F1/F2/P3/P4)
    "jaffle_metricflow_time_spine": marts_segmentation.metricflow_time_spine,
    "jaffle_customer_segmentation": marts_segmentation.customer_segmentation,
    "jaffle_daily_summary": marts_segmentation.daily_summary,
    "jaffle_growth_metrics": marts_segmentation.growth_metrics,
    "jaffle_time_analytics": marts_segmentation.time_analytics,
}

# staging models (P1/P2/F1/F5/F8/F13), intermediate analyses, and time
# rollups are verified through digest queries — one driver slot per group,
# full-content hash per model (see queries/digests.py docstring).
from .digests import DIGEST_CATALOG

register(
    "jaffle_staging_digest", *DIGEST_CATALOG["jaffle_staging_digest"]
)

for _name, _fn in _JAFFLE_MODELS.items():
    register(_name, _fn, jaffle_sql(_name.removeprefix("jaffle_")))

register(
    "jaffle_intermediate_digest", *DIGEST_CATALOG["jaffle_intermediate_digest"]
)
register(
    "jaffle_rollups_digest", *DIGEST_CATALOG["jaffle_rollups_digest"]
)

# ------------------------------------------- test operators (SURVEY §2.9)
# T1–T5 as violation queries (0 rows on valid data, dbt failure-row
# contract). Consolidated into ONE digest slot (r3): each test's
# (name, n_rows, content_digest) row pins the same failure-row contract
# the five individual slots verified in rounds 1–2, freeing budget for
# the round-3 operators below.
from .op_digests import OP_DIGEST_CATALOG

register("jaffle_tests_digest", *OP_DIGEST_CATALOG["jaffle_tests_digest"])

# --------------------------------------------- semantic layer (SURVEY §2.10)
# Saved queries (M6) compiled by the metric layer; oracle SQL is generated
# from the same declarations the Spark plan compiles from.
from ..semantic import SEMANTIC_CATALOG

for _name, (_fn, _sql) in SEMANTIC_CATALOG.items():
    register(_name, _fn, _sql)

# ----------------------------------------- beyond-reference extensions
# LLM-data-pipeline operators (llm/) + Structured Streaming (streaming/).
# Every entry carries an exact DuckDB oracle — the approximate operators
# (MinHash-LSH, SimHash, hyperplane-LSH) run fixed-seed algorithms the
# oracle reproduces verbatim.
from ..llm import LLM_CATALOG
from ..streaming import daily as _streaming_daily
from ..streaming import sessionize as _streaming_sessionize

register(
    "streaming_daily_events",
    _streaming_daily.streaming_daily_events,
    _streaming_daily.ORACLES["streaming_daily_events"],
)
register(
    "streaming_sessionize",
    _streaming_sessionize.streaming_sessionize,
    _streaming_sessionize.ORACLES["streaming_sessionize"],
)

# Digest-consolidated operator groups (queries/op_digests.py). Members
# listed here are value-verified through their group's digest slot
# instead of an individual slot; bench-headline operators (text_quality,
# events_sessionize, events_asof_join, dedup/sim production paths) keep
# their own slots for round-over-round timing continuity.
_GROUP_DIGESTED = {
    "text_token_stats",
    "text_langid",
    "text_fingerprint",
    "text_pii_scrub",
    "text_tfidf_topk",
    "text_repetition",
    "text_lm_score",
    "doc_chunk",
    "multimodal_extract",
    "multimodal_framesample",
    "multimodal_resize",
    "multimodal_audio",
    "multimodal_pixels",
    "multimodal_jpeg_pixels",
    "multimodal_color_pixels",
    "multimodal_jpeg420_pixels",
    "multimodal_progressive_pixels",
    "multimodal_progressive_color",
    "multimodal_progressive420_pixels",
    "multimodal_gif_anim",
    "multimodal_png_alpha",
    # r9: the FLAC roundtrip member — driver-verified through
    # multimodal_digest
    "multimodal_flac",
    "multimodal_png_palette",
    "multimodal_png_color",
    "multimodal_gif_frames",
    "multimodal_thumbnail",
    "corpus_curate",
    "corpus_sample_stratified",
    "corpus_shuffle_shard",
    "events_funnel",
    "events_json_stats",
    "events_stickiness",
    "events_transition_topk",
    "events_salted_join",
    "events_range_join",
    "events_bloom_join",
    "text_zipf_topk",
    # r9: the embedding clustering twin — driver-verified through
    # sim_eval_digest (VERDICT r8 item 1)
    "emb_clusters_star",
}
# (llm/prep.py's operators — corpus_segment_dedup, corpus_mix_sample,
# emb_project, and the rest — never enter LLM_CATALOG at all: prep is
# not in llm/__init__'s module list, so they are digest-only by
# construction and need no entry here.)

for _name, (_fn, _sql) in LLM_CATALOG.items():
    if _name not in _GROUP_DIGESTED:
        register(_name, _fn, _sql)

# r4: the stream-stream interval join (click→purchase attribution) —
# exact batch oracle, same availableNow machinery as the other two
# streaming slots.
from ..streaming import joins as _streaming_joins

register(
    "streaming_attribution",
    _streaming_joins.streaming_attribution,
    _streaming_joins.ORACLES["streaming_attribution"],
)

# r4b: watermark-scoped streaming exact dedup — the identity oracle
# value-checks the whole stream path on the (unique-id) testdata feed;
# duplicate-drop semantics are pytest-pinned with a replayed file.
from ..streaming import dedup as _streaming_dedup

register(
    "streaming_dedup_events",
    _streaming_dedup.streaming_dedup_query,
    _streaming_dedup.ORACLES["streaming_dedup_events"],
)

# r5: ACID materializations share ONE digest slot — the SCD2 snapshot
# fold (dbt `snapshots/`, its own slot in r4) and the MERGE upsert fold
# (dbt `incremental_strategy: merge` through the real
# AcidTable.merge_rows commit path). Consolidation freed the slot the
# merge fold needed while keeping both value-verified.
register("acid_digest", *OP_DIGEST_CATALOG["acid_digest"])

# r6: profiling + auditing share ONE digest slot — the r5 profiling
# members (moved out of acid_digest so group names stay truthful) plus
# the dbt-audit-helper compare_relations analogue and its row-level
# mismatch sample. The slot was freed by demoting
# dedup_clusters_propagation to the pytest cross-check (the star
# algorithm now holds the production `dedup_clusters` name and slot).
register("profile_digest", *OP_DIGEST_CATALOG["profile_digest"])

register("text_digest", *OP_DIGEST_CATALOG["text_digest"])
register("multimodal_digest", *OP_DIGEST_CATALOG["multimodal_digest"])

# Corpus-preparation operators (llm/prep.py + llm/corpus.py) share ONE
# digest slot; event analytics (funnel/JSON stats) and the ANN
# evaluation pair (recall@k, kNN classify) each share one (r4).
register("prep_digest", *OP_DIGEST_CATALOG["prep_digest"])
register("events_digest", *OP_DIGEST_CATALOG["events_digest"])
register("sim_eval_digest", *OP_DIGEST_CATALOG["sim_eval_digest"])

assert len(QUERIES) <= 50, (
    f"driver records only the first 50 queries; got {len(QUERIES)} — "
    "consolidate into digests (queries/digests.py) before adding more"
)
