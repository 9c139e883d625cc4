"""Relation auditing (r6, SURVEY §2 gap-closure): the dbt-audit-helper
analogue. The reference declares the package (`packages.yml:6`) and its
README's write-audit-publish workflow (`README.md:54-57`) is exactly
this step — before publishing a rebuilt table, full-outer-join it to
the incumbent on the primary key and report, per column, how many rows
match; `compare_relations` / `compare_relation_columns` are the public
dbt-audit-helper macros this module re-expresses as DataFrame algebra.

Two operators:

* ``audit_compare_relations`` — the per-column summary: PK coverage
  (rows only in a / only in b / in both) and, over the both-present
  rows, matched/mismatched counts with an integer basis-point match
  rate (``matched * 10000 div both`` — integer so both engines agree
  bit-for-bit; audit-helper's percentage column, without doubles).
* ``audit_mismatch_sample`` — the row-level evidence: for every column,
  the first ``SAMPLE_K`` mismatching primary keys with both sides'
  string representations — what a human actually pulls up to diagnose
  a failed audit.

Plan shape for 100 TB: ONE full-outer shuffle join on the PK (both
sides hash-partitioned on the same key — the single unavoidable
shuffle), then per-column comparison is an `array(struct(...))` +
`explode` (map-side, |cols|× fan-out) feeding ONE partial-aggregated
groupBy on |cols| keys. No windows in the summary. The sample path
filters to mismatches FIRST and takes its per-column top-k through a
rank window partitioned by col_name — Spark plans the rank≤k filter as
WindowGroupLimit (partial per-partition top-k before the |cols|-key
exchange), so no task ever holds more than k·partitions candidate rows
regardless of how many mismatches a 100 TB drift produces.

The registered pair audits `orders` against a deterministically
DRIFTED copy of itself (dropped keys, injected keys, perturbed status /
price / date — all pure functions of ``o_orderkey``), so the oracle
reproduces the exact same drift relationally and every count is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table

SAMPLE_K = 5

# Normalized comparison columns over orders — the double is compared as
# integer cents (exact in both engines; audit-helper compares raw
# values, but a bit-stable audit of a float column is cents, not IEEE
# stringification).
_COMPARE: list[tuple[str, str]] = [
    ("o_custkey", "o_custkey"),
    ("o_orderstatus", "o_orderstatus"),
    ("o_totalprice_cents", "cast(round(o_totalprice * 100) as bigint)"),
    ("o_orderdate", "o_orderdate"),
    ("o_orderpriority", "o_orderpriority"),
]

# Drift rules (pure functions of the PK, mirrored in the oracle):
_DROP_MOD = 97      # keys % 97 == 0 exist only in a
_INJECT_MOD = 101   # keys % 101 == 0 are re-inserted with key+OFFSET
_INJECT_OFFSET = 100_000_000
_STATUS_MOD = 11    # status overwritten with 'X'
_PRICE_MOD = 13     # +100 cents
_DATE_MOD = 17      # +1 day


def compare_relations(
    a: DataFrame,
    b: DataFrame,
    pk: str,
    columns: list[str],
) -> tuple[DataFrame, DataFrame]:
    """Generic audit of two relations sharing a PK and column set.

    Returns ``(summary, mismatches)``:

    * summary — one row per compared column: ``col_name, n_pk_only_a,
      n_pk_only_b, n_pk_both, n_matched, n_mismatched, match_bp``
      (NULL-safe equality: both-NULL counts as a match, matching
      audit-helper's semantics).
    * mismatches — every both-present row whose value differs, as
      ``col_name, pk, a_repr, b_repr`` (string reprs; un-sampled — the
      caller limits, see ``audit_mismatch_sample``).
    """
    an = a.select(F.col(pk), *[F.col(c).alias(f"a_{c}") for c in columns])
    bn = b.select(F.col(pk), *[F.col(c).alias(f"b_{c}") for c in columns])
    # USING-style full outer: Spark coalesces the join key, and presence
    # is recoverable from any side column IF columns were non-null — use
    # explicit presence flags instead so all-NULL rows stay correct.
    joined = (
        an.withColumn("__in_a", F.lit(True))
        .join(bn.withColumn("__in_b", F.lit(True)), [pk], "full_outer")
        .withColumn("__in_a", F.coalesce("__in_a", F.lit(False)))
        .withColumn("__in_b", F.coalesce("__in_b", F.lit(False)))
    )
    per_col = joined.select(
        F.col(pk),
        "__in_a",
        "__in_b",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        F.col(f"a_{c}")
                        .eqNullSafe(F.col(f"b_{c}"))
                        .alias("matched"),
                        F.col(f"a_{c}").cast("string").alias("a_repr"),
                        F.col(f"b_{c}").cast("string").alias("b_repr"),
                    )
                    for c in columns
                ]
            )
        ).alias("cmp"),
    ).select(pk, "__in_a", "__in_b", "cmp.*")
    both = F.col("__in_a") & F.col("__in_b")
    summary = (
        per_col.groupBy("col_name")
        .agg(
            F.sum(F.when(F.col("__in_a") & ~F.col("__in_b"), 1).otherwise(0))
            .alias("n_pk_only_a"),
            F.sum(F.when(~F.col("__in_a") & F.col("__in_b"), 1).otherwise(0))
            .alias("n_pk_only_b"),
            F.sum(F.when(both, 1).otherwise(0)).alias("n_pk_both"),
            F.sum(F.when(both & F.col("matched"), 1).otherwise(0))
            .alias("n_matched"),
            F.sum(F.when(both & ~F.col("matched"), 1).otherwise(0))
            .alias("n_mismatched"),
        )
        .withColumn(
            "match_bp",
            F.when(
                F.col("n_pk_both") > 0,
                F.expr("(n_matched * 10000) div n_pk_both"),
            ).otherwise(F.lit(None).cast("bigint")),
        )
    )
    mismatches = per_col.where(both & ~F.col("matched")).select(
        "col_name", F.col(pk).alias("pk"), "a_repr", "b_repr"
    )
    return summary, mismatches


def compare_relation_columns(a: DataFrame, b: DataFrame) -> list[dict]:
    """Schema-level diff — dbt-audit-helper's ``compare_relation_columns``
    macro: align the two relations' columns by name and report, per
    column, presence on each side, both data types, and whether the
    types match. Driver-side metadata only (no job runs); returned as a
    plain list of dicts ordered by a's column order then b-only extras,
    so callers can render or assert on it directly."""
    a_types = {f.name: f.dataType.simpleString() for f in a.schema.fields}
    b_types = {f.name: f.dataType.simpleString() for f in b.schema.fields}
    ordered = [f.name for f in a.schema.fields] + [
        f.name for f in b.schema.fields if f.name not in a_types
    ]
    return [
        {
            "col_name": c,
            "in_a": c in a_types,
            "in_b": c in b_types,
            "a_type": a_types.get(c),
            "b_type": b_types.get(c),
            "type_match": a_types.get(c) is not None
            and a_types.get(c) == b_types.get(c),
        }
        for c in ordered
    ]


def _orders_pair(
    spark: SparkSession, sf_dir: str | None
) -> tuple[DataFrame, DataFrame]:
    """orders (relation a) and its deterministically drifted copy (b)."""
    orders = load_table(spark, "orders", sf_dir)
    norm = [f"{expr} as {name}" for name, expr in _COMPARE]
    a = orders.selectExpr("o_orderkey", *norm)
    drifted = [
        "o_custkey",
        f"case when o_orderkey % {_STATUS_MOD} = 0 then 'X'"
        " else o_orderstatus end as o_orderstatus",
        "cast(round(o_totalprice * 100) as bigint)"
        f" + case when o_orderkey % {_PRICE_MOD} = 0 then 100 else 0 end"
        " as o_totalprice_cents",
        f"o_orderdate + (case when o_orderkey % {_DATE_MOD} = 0"
        " then INTERVAL '1' DAY else INTERVAL '0' DAY end) as o_orderdate",
        "o_orderpriority",
    ]
    b = (
        orders.where(f"o_orderkey % {_DROP_MOD} != 0")
        .selectExpr("o_orderkey", *drifted)
        .unionByName(
            orders.where(f"o_orderkey % {_INJECT_MOD} = 0").selectExpr(
                f"o_orderkey + {_INJECT_OFFSET} as o_orderkey", *norm
            )
        )
    )
    return a, b


def audit_compare_relations(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    a, b = _orders_pair(spark, sf_dir)
    summary, _ = compare_relations(
        a, b, "o_orderkey", [name for name, _ in _COMPARE]
    )
    return summary.select(
        "col_name",
        "n_pk_only_a",
        "n_pk_only_b",
        "n_pk_both",
        "n_matched",
        "n_mismatched",
        "match_bp",
    )


def audit_mismatch_sample(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """First SAMPLE_K mismatching PKs per column with both reprs —
    deterministic (PK-ordered, PKs unique within a column)."""
    from pyspark.sql import Window

    a, b = _orders_pair(spark, sf_dir)
    _, mism = compare_relations(
        a, b, "o_orderkey", [name for name, _ in _COMPARE]
    )
    w = Window.partitionBy("col_name").orderBy("pk")
    return (
        mism.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= SAMPLE_K)
        .select("col_name", "pk", "a_repr", "b_repr")
    )


# ------------------------------------------------------------- oracle SQL

_NORM_SELECT = ", ".join(f"{expr} AS {name}" for name, expr in _COMPARE)

_PAIR_CTE = f"""
a AS (SELECT o_orderkey, {_NORM_SELECT} FROM orders),
b AS (
    SELECT o_orderkey,
           o_custkey,
           CASE WHEN o_orderkey % {_STATUS_MOD} = 0 THEN 'X'
                ELSE o_orderstatus END AS o_orderstatus,
           CAST(round(o_totalprice * 100) AS BIGINT)
             + CASE WHEN o_orderkey % {_PRICE_MOD} = 0 THEN 100 ELSE 0 END
             AS o_totalprice_cents,
           o_orderdate + CASE WHEN o_orderkey % {_DATE_MOD} = 0
               THEN INTERVAL 1 DAY ELSE INTERVAL 0 DAY END AS o_orderdate,
           o_orderpriority
    FROM orders WHERE o_orderkey % {_DROP_MOD} != 0
    UNION ALL
    SELECT o_orderkey + {_INJECT_OFFSET}, {_NORM_SELECT}
    FROM orders WHERE o_orderkey % {_INJECT_MOD} = 0
),
j AS (
    SELECT a.o_orderkey AS apk, b.o_orderkey AS bpk,
           {", ".join(f"a.{n} AS a_{n}, b.{n} AS b_{n}" for n, _ in _COMPARE)}
    FROM a FULL OUTER JOIN b ON a.o_orderkey = b.o_orderkey
)"""


def _summary_select(col: str) -> str:
    return f"""
SELECT '{col}' AS col_name,
       CAST(sum(CASE WHEN apk IS NOT NULL AND bpk IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pk_only_a,
       CAST(sum(CASE WHEN apk IS NULL AND bpk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pk_only_b,
       CAST(sum(CASE WHEN apk IS NOT NULL AND bpk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_pk_both,
       CAST(sum(CASE WHEN apk IS NOT NULL AND bpk IS NOT NULL
                 AND a_{col} IS NOT DISTINCT FROM b_{col} THEN 1 ELSE 0 END) AS BIGINT) AS n_matched,
       CAST(sum(CASE WHEN apk IS NOT NULL AND bpk IS NOT NULL
                 AND a_{col} IS DISTINCT FROM b_{col} THEN 1 ELSE 0 END) AS BIGINT) AS n_mismatched,
       CAST(sum(CASE WHEN apk IS NOT NULL AND bpk IS NOT NULL
                 AND a_{col} IS NOT DISTINCT FROM b_{col} THEN 1 ELSE 0 END) * 10000
            // sum(CASE WHEN apk IS NOT NULL AND bpk IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS match_bp
FROM j"""


def _sample_select(col: str) -> str:
    return f"""
(SELECT '{col}' AS col_name, apk AS pk,
        CAST(a_{col} AS VARCHAR) AS a_repr,
        CAST(b_{col} AS VARCHAR) AS b_repr
 FROM j
 WHERE apk IS NOT NULL AND bpk IS NOT NULL
   AND a_{col} IS DISTINCT FROM b_{col}
 ORDER BY apk LIMIT {SAMPLE_K})"""


ORACLES: dict[str, str] = {
    "audit_compare_relations": f"""
WITH {_PAIR_CTE.strip()}
{" UNION ALL ".join(_summary_select(n) for n, _ in _COMPARE)}
""",
    "audit_mismatch_sample": f"""
WITH {_PAIR_CTE.strip()}
SELECT * FROM (
{" UNION ALL ".join(_sample_select(n) for n, _ in _COMPARE)}
)
""",
}
