"""Operator-group digest queries — several standalone operators verified
in ONE driver slot (same machinery and strength as queries/digests.py:
per-operator full-content order-insensitive md5-sum, so any changed
value, extra/missing row, or stringified-type drift flips the digest).

Four groups are consolidated here to stay inside the driver's 50-slot
recording budget while every operator remains value-verified:

* ``jaffle_tests_digest`` — the five declarative test operators
  (SURVEY §2.9 T1–T5). Each test query returns its violation rows
  (0 rows on valid data); the digest pins (name, n_rows, content_digest)
  for all five, which is exactly the dbt failure-row contract the
  individual slots verified in rounds 1–2.
* ``text_digest`` — text_token_stats / text_langid / text_fingerprint /
  text_pii_scrub / text_tfidf_topk (r4) — text_quality keeps its own
  slot: it is in the bench headline set.
* ``prep_digest`` — the corpus-preparation operators
  corpus_decontaminate / doc_pack / emb_quantize (r3) and
  doc_dup_grams / corpus_source_stats / doc_cdc_chunks (r4) from
  llm/prep.py.
* ``multimodal_digest`` — multimodal_extract / multimodal_framesample /
  multimodal_resize (llm/multimodal.py).

Schemas here are the DOUBLE-aware normalization schemas: the digest
row-hash only branches on `double` (quantize at 1e-6), every other type
stringifies identically in Spark and DuckDB. A pytest asserts the
declared column names match the live DataFrames so drift fails loudly.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession

from ..llm import multimodal as llm_multimodal
from ..llm import prep as llm_prep
from ..llm import text as llm_text
from .digests import digest_df, digest_select_duck
from .oracle_jaffle import jaffle_sql_multi
from .test_suite import (
    t1_not_null_customers_pk,
    t2_unique_orders_pk,
    t3_accepted_values_customer_type,
    t4_relationships_items_orders,
    t5_orders_conservation,
)

# ------------------------------------------------- T1–T5 tests digest

# (builder, normalization schema, oracle SELECT producing the same rows)
_TEST_MEMBERS: dict[str, tuple] = {
    "t1_not_null_customers_pk": (
        t1_not_null_customers_pk,
        [("customer_id", "bigint")],
    ),
    "t2_unique_orders_pk": (
        t2_unique_orders_pk,
        [("order_id", "bigint"), ("n_records", "bigint")],
    ),
    "t3_accepted_values_customer_type": (
        t3_accepted_values_customer_type,
        [("customer_type", "string"), ("n_records", "bigint")],
    ),
    "t4_relationships_items_orders": (
        t4_relationships_items_orders,
        [("order_id", "bigint")],
    ),
    "t5_orders_conservation": (
        t5_orders_conservation,
        [
            ("order_id", "bigint"),
            ("subtotal_cents", "bigint"),
            ("tax_paid_cents", "bigint"),
            ("order_total_cents", "bigint"),
        ],
    ),
}

# The per-test violation SELECTs (DuckDB dialect) — identical to the
# round-2 individual oracle bodies, now embedded as digest subqueries.
_TEST_SELECTS: dict[str, str] = {
    "t1_not_null_customers_pk": (
        "SELECT customer_id FROM customers WHERE customer_id IS NULL"
    ),
    "t2_unique_orders_pk": (
        "SELECT order_id, count(*) AS n_records FROM orders_mart"
        " GROUP BY order_id HAVING count(*) > 1"
    ),
    "t3_accepted_values_customer_type": (
        "SELECT customer_type, count(*) AS n_records FROM customers"
        " WHERE customer_type NOT IN ('new', 'returning')"
        " AND customer_type IS NOT NULL GROUP BY customer_type"
    ),
    "t4_relationships_items_orders": (
        "SELECT i.order_id FROM stg_order_items i"
        " LEFT JOIN (SELECT DISTINCT order_id FROM stg_orders) o"
        " ON i.order_id = o.order_id"
        " WHERE i.order_id IS NOT NULL AND o.order_id IS NULL"
    ),
    "t5_orders_conservation": (
        "SELECT order_id, subtotal_cents, tax_paid_cents, order_total_cents"
        " FROM stg_orders WHERE NOT COALESCE("
        "order_total_cents - tax_paid_cents = subtotal_cents, FALSE)"
    ),
}


def jaffle_tests_digest(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    parts = [
        digest_df(fn(spark, sf_dir), name, schema)
        for name, (fn, schema) in _TEST_MEMBERS.items()
    ]
    return reduce(DataFrame.unionByName, parts)


def _tests_oracle() -> str:
    selects = " UNION ALL ".join(
        digest_select_duck(name, schema, f"({_TEST_SELECTS[name]})")
        for name, (_fn, schema) in _TEST_MEMBERS.items()
    )
    # closure of customers/orders covers every relation the tests read
    return jaffle_sql_multi(["customers", "orders", "order_items"], selects)


# ------------------------------------------------------ text ops digest

_TEXT_MEMBERS: dict[str, list[tuple[str, str]]] = {
    "text_token_stats": [
        ("doc_id", "bigint"),
        ("n_tokens", "bigint"),
        ("n_distinct_tokens", "bigint"),
        ("n_bpe_tokens", "bigint"),
        ("sum_token_chars", "bigint"),
        ("avg_token_len", "double"),
        ("type_token_ratio", "double"),
    ],
    "text_langid": [
        ("doc_id", "bigint"),
        ("label_lang", "string"),
        ("score_en", "bigint"),
        ("score_de", "bigint"),
        ("score_es", "bigint"),
        ("score_fr", "bigint"),
        ("score_zh", "bigint"),
        ("predicted_lang", "string"),
        ("matches_label", "boolean"),
    ],
    "text_fingerprint": [
        ("doc_id", "bigint"),
        ("md5_fingerprint", "string"),
        ("min_shingle_hash", "bigint"),
        ("norm_chars", "bigint"),
    ],
    # r4: log-free tf-idf top-terms (llm/text.py)
    "text_tfidf_topk": [
        ("doc_id", "bigint"),
        ("rank", "bigint"),
        ("term", "string"),
        ("tf", "bigint"),
        ("df", "bigint"),
        ("score_bp", "bigint"),
    ],
    "text_pii_scrub": [
        ("doc_id", "bigint"),
        ("n_emails", "bigint"),
        ("n_ipv4", "bigint"),
        ("n_phones", "bigint"),
        ("scrubbed_md5", "string"),
        ("scrubbed_chars", "bigint"),
    ],
}


def text_digest(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    parts = [
        digest_df(getattr(llm_text, name)(spark, sf_dir), name, schema)
        for name, schema in _TEXT_MEMBERS.items()
    ]
    return reduce(DataFrame.unionByName, parts)


def _text_oracle() -> str:
    return " UNION ALL ".join(
        digest_select_duck(name, schema, f"({llm_text.ORACLES[name]})")
        for name, schema in _TEXT_MEMBERS.items()
    )


# ---------------------------------------------- corpus-prep ops digest

_PREP_MEMBERS: dict[str, list[tuple[str, str]]] = {
    "corpus_decontaminate": [
        ("doc_id", "bigint"),
        ("n_overlap_8grams", "bigint"),
        ("is_contaminated", "boolean"),
    ],
    "doc_pack": [
        ("doc_id", "bigint"),
        ("lang", "string"),
        ("n_tokens", "bigint"),
        ("ctx_id", "bigint"),
        ("ctx_offset", "bigint"),
        ("spans_boundary", "boolean"),
    ],
    "emb_quantize": [
        ("vec_id", "bigint"),
        ("n_dims", "bigint"),
        ("max_abs_micro", "bigint"),
        ("max_abs_err_q127", "bigint"),
        ("sum_abs_err_q127", "bigint"),
    ],
    # r4: cross-doc duplicated-substring fraction (llm/prep.py)
    "doc_dup_grams": [
        ("doc_id", "bigint"),
        ("n_grams", "bigint"),
        ("n_dup_grams", "bigint"),
        ("dup_fraction", "double"),
    ],
    # r4: content-defined chunking (llm/prep.py)
    "doc_cdc_chunks": [
        ("doc_id", "bigint"),
        ("chunk_idx", "bigint"),
        ("start_tok", "bigint"),
        ("end_tok", "bigint"),
        ("n_tok", "bigint"),
        ("chunk_hash", "bigint"),
    ],
    # r4: source/domain-level filtering stats (llm/prep.py)
    "corpus_source_stats": [
        ("source", "string"),
        ("n_docs", "bigint"),
        ("n_canonical", "bigint"),
        ("total_tokens", "bigint"),
        ("sum_score_micro", "bigint"),
        ("mean_quality", "double"),
        ("exact_dup_rate", "double"),
        ("keep_source", "boolean"),
    ],
}


def prep_digest(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    parts = [
        digest_df(getattr(llm_prep, name)(spark, sf_dir), name, schema)
        for name, schema in _PREP_MEMBERS.items()
    ]
    return reduce(DataFrame.unionByName, parts)


def _prep_oracle() -> str:
    return " UNION ALL ".join(
        digest_select_duck(name, schema, f"({llm_prep.ORACLES[name]})")
        for name, schema in _PREP_MEMBERS.items()
    )


# ---------------------------------------------- multimodal ops digest

_MM_MEMBERS: dict[str, list[tuple[str, str]]] = {
    "multimodal_extract": [
        ("doc_id", "bigint"),
        ("media_type", "string"),
        ("n_bytes", "bigint"),
        ("content_md5", "string"),
        ("width", "bigint"),
        ("height", "bigint"),
        ("n_frames", "bigint"),
    ],
    "multimodal_framesample": [
        ("doc_id", "bigint"),
        ("n_frames", "bigint"),
        ("frame_idx", "bigint"),
        ("frame_md5", "string"),
    ],
    "multimodal_resize": [
        ("doc_id", "bigint"),
        ("width", "bigint"),
        ("height", "bigint"),
        ("new_width", "bigint"),
        ("new_height", "bigint"),
        ("resized_bytes", "bigint"),
    ],
}


def multimodal_digest(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    parts = [
        digest_df(getattr(llm_multimodal, name)(spark, sf_dir), name, schema)
        for name, schema in _MM_MEMBERS.items()
    ]
    return reduce(DataFrame.unionByName, parts)


def _mm_oracle() -> str:
    return " UNION ALL ".join(
        digest_select_duck(name, schema, f"({llm_multimodal.ORACLES[name]})")
        for name, schema in _MM_MEMBERS.items()
    )


OP_DIGEST_CATALOG: dict[str, tuple] = {
    "jaffle_tests_digest": (jaffle_tests_digest, _tests_oracle()),
    "text_digest": (text_digest, _text_oracle()),
    "prep_digest": (prep_digest, _prep_oracle()),
    "multimodal_digest": (multimodal_digest, _mm_oracle()),
}
