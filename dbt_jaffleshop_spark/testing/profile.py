"""Table profiling (r5, beyond-reference): per-column data-quality
statistics over a source table — row count, null count, exact distinct
count, and min/max representations. The dbt-ecosystem analogue is the
dbt-profiler package's `print_profile` (public docs); profiling a source
before modeling is the standard first step of any warehouse DAG and the
operational complement of the T1–T5 declarative tests (a failed
expectation points here first).

Plan shape for 100 TB: ONE scan — a single aggregate computes every
column's statistics in the same pass (Spark plans the multi-distinct
aggregate via Expand: |cols|+1 shuffle streams over one scan, each
partial-aggregated); the long (one-row-per-column) shape is produced by
`stack` on the 1-row aggregate, so the unpivot costs nothing. No
windows, no joins.

Determinism notes: `o_totalprice` is profiled as integer cents (doubles
stringify engine-dependently); timestamp/date/integer/string min-max
reprs stringify identically in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table

# (profile row name, SQL expression over orders) — cents for the double
_SPECS: list[tuple[str, str]] = [
    ("o_orderkey", "o_orderkey"),
    ("o_custkey", "o_custkey"),
    ("o_orderstatus", "o_orderstatus"),
    ("o_totalprice_cents", "cast(round(o_totalprice * 100) as bigint)"),
    ("o_orderdate", "o_orderdate"),
    ("o_orderpriority", "o_orderpriority"),
]


def orders_profile(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    orders = load_table(spark, "orders", sf_dir)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for name, e in _SPECS:
        c = F.expr(e)
        aggs += [
            (F.count(F.lit(1)) - F.count(c)).alias(f"{name}__nn"),
            F.countDistinct(c).alias(f"{name}__nd"),
            F.min(c).cast("string").alias(f"{name}__min"),
            F.max(c).cast("string").alias(f"{name}__max"),
        ]
    row = orders.agg(*aggs)
    stack_args = ", ".join(
        f"'{name}', {name}__nn, {name}__nd, {name}__min, {name}__max"
        for name, _ in _SPECS
    )
    return row.selectExpr(
        f"stack({len(_SPECS)}, {stack_args})"
        " as (col_name, n_null, n_distinct, min_repr, max_repr)",
        "n_rows",
    ).select("col_name", "n_rows", "n_null", "n_distinct", "min_repr", "max_repr")


QUANTILES_BP = (50, 90, 99)  # p50 / p90 / p99


def orders_quantiles(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Exact per-month order-value quantiles (r5) — p50/p90/p99 of the
    cents-quantized totals, defined as the value at rank ceil(q·n) of
    the month's ascending sort (the classic exact "lower quantile").

    Scale shape for 100 TB: NOT a rank window over the fact rows (a
    month of a 100 TB fact in one window task is the global-window
    anti-pattern) — instead the exact histogram method: groupBy(month,
    cents) first, so the cumulative window runs over the DISTINCT VALUE
    DOMAIN per month (price cardinality, dimension-sized — the same
    post-aggregation window contract W2 holds the rank marts to), then
    each quantile is min(value where cum ≥ ceil(q·n)), a conditional
    aggregate. Two key-partitioned shuffles total, both
    partial-aggregated; ceil is spelled in integers ((n·q + 99) div
    100) so both engines agree exactly."""
    from pyspark.sql import Window

    orders = load_table(spark, "orders", sf_dir)
    hist = (
        orders.select(
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias("cents"),
        )
        .groupBy("month", "cents")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum_w = (
        Window.partitionBy("month")
        .orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    n_w = Window.partitionBy("month")
    cum = (
        hist.withColumn("cum", F.sum("c").over(cum_w))
        .withColumn("n_orders", F.sum("c").over(n_w))
    )
    quantile_cols = [
        F.min(
            F.when(
                F.col("cum") >= F.expr(f"(n_orders * {q} + 99) div 100"),
                F.col("cents"),
            )
        ).alias(f"p{q}_cents")
        for q in QUANTILES_BP
    ]
    return (
        cum.groupBy("month")
        .agg(F.max("n_orders").alias("n_orders"), *quantile_cols)
        .select(
            "month", "n_orders",
            *[f"p{q}_cents" for q in QUANTILES_BP],
        )
    )


def _quantiles_oracle() -> str:
    qcols = ",\n       ".join(
        f"CAST(min(CASE WHEN cum >= (n_orders * {q} + 99) // 100"
        f" THEN cents END) AS BIGINT) AS p{q}_cents"
        for q in QUANTILES_BP
    )
    return f"""
WITH hist AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           CAST(count(*) AS BIGINT) AS c
    FROM orders GROUP BY 1, 2
),
cum AS (
    SELECT month, cents, c,
           CAST(sum(c) OVER (PARTITION BY month ORDER BY cents
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
           CAST(sum(c) OVER (PARTITION BY month) AS BIGINT) AS n_orders
    FROM hist
)
SELECT month, CAST(max(n_orders) AS BIGINT) AS n_orders,
       {qcols}
FROM cum GROUP BY month
"""


KMV_K = 64
# Deterministic 31-bit hash shared with the oracle: ((x % M) * A + B) % M.
# Mod-BEFORE-multiply keeps the product under 2^62, so the arithmetic is
# overflow-free int64 in BOTH engines (DuckDB raises on int64 overflow
# where Spark wraps — a silent cross-engine divergence otherwise).
KMV_M = 2_147_483_647  # 2^31 − 1 (prime)
KMV_A = 1_103_515_245
KMV_B = 12_345


def events_distinct_kmv(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Per-event-type distinct-user cardinality via a K-minimum-values
    sketch (r6) — Bar-Yossef et al. 2002, the order-statistics
    cardinality estimator: hash every key into [0, M), keep the K
    smallest distinct hash values, estimate distinct = (K−1)·M / h_K.
    THE reproducible distinct-count tool for 100 TB profiling:
    `approx_count_distinct`'s HLL is engine-specific (no DuckDB oracle
    can reproduce it), while KMV under a fixed integer hash is
    bit-identical in both engines — and sketches from disjoint
    partitions/days merge by keeping the K smallest of the union,
    which is what makes it a real warehouse primitive. The exact
    distinct count and the estimator's basis-point error ship in the
    same row, so the driver also verifies estimation QUALITY.

    Plan shape for 100 TB: ONE partial-aggregated distinct on
    (event_type, h) — corpus-sized work ends there — then the per-type
    K-smallest runs through a rank window that Spark plans as
    WindowGroupLimit (per-partition partial top-K before the
    |event_types|-key exchange), the zipf/top-k contract; the exact
    count joins from its own pre-aggregated |event_types|-row relation.
    """
    events = load_table(spark, "events", sf_dir)
    from pyspark.sql import Window

    h = (
        events.selectExpr(
            "event_type",
            f"((user_id % {KMV_M}) * {KMV_A} + {KMV_B}) % {KMV_M} as h",
        )
        .groupBy("event_type", "h")
        .agg(F.lit(1).alias("_one"))
    )
    w = Window.partitionBy("event_type").orderBy("h")
    sketch = (
        h.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= KMV_K)
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.max("h").alias("h_k"),
        )
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_exact")
    )
    return (
        sketch.join(exact, "event_type")
        .withColumn(
            "est_distinct",
            F.when(
                F.col("n_kept") == KMV_K,
                F.expr(f"({KMV_K - 1} * {KMV_M}L) div h_k"),
            ).otherwise(F.col("n_kept")),  # < K distinct ⇒ sketch is exact
        )
        .withColumn(
            "err_bp",
            F.expr("abs(est_distinct - n_exact) * 10000 div n_exact"),
        )
        .select("event_type", "n_exact", "n_kept", "est_distinct", "err_bp")
    )


def _kmv_oracle() -> str:
    return f"""
WITH h AS (
    SELECT DISTINCT event_type,
           ((user_id % {KMV_M}) * {KMV_A} + {KMV_B}) % {KMV_M} AS h
    FROM events
),
r AS (
    SELECT event_type, h,
           row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM h
),
k AS (
    SELECT event_type, CAST(count(*) AS BIGINT) AS n_kept,
           max(h) AS h_k
    FROM r WHERE rn <= {KMV_K} GROUP BY event_type
),
x AS (
    SELECT event_type, CAST(count(DISTINCT user_id) AS BIGINT) AS n_exact
    FROM events GROUP BY event_type
),
e AS (
    SELECT k.event_type, x.n_exact, k.n_kept,
           CAST(CASE WHEN k.n_kept = {KMV_K}
                THEN (CAST({KMV_K - 1} AS BIGINT) * {KMV_M}) // k.h_k
                ELSE k.n_kept END AS BIGINT) AS est_distinct
    FROM k JOIN x ON k.event_type = x.event_type
)
SELECT event_type, n_exact, n_kept, est_distinct,
       CAST(abs(est_distinct - n_exact) * 10000 // n_exact AS BIGINT) AS err_bp
FROM e
"""


def orders_cube_summary(spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
    """Multi-level aggregation via CUBE — every (order_year, priority)
    combination PLUS both one-dimension rollups and the grand total in
    one pass, disambiguated by ``grouping_id`` (ANSI GROUPING SETS;
    Spark compiles it to a single Expand over one scan, so the four
    aggregation levels cost one shuffle, not four queries — the standard
    warehouse summary-table shape).

    Revenue sums as integer cents: super-aggregate rows sum the whole
    table, where double accumulation order would drift between engines;
    integers cannot. grouping_id bit order (first column = MSB) matches
    DuckDB/Postgres GROUPING()."""
    o = load_table(spark, "orders", sf_dir).select(
        F.year("o_orderdate").alias("order_year"),
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100).cast("bigint").alias("cents"),
        "o_custkey",
    )
    return (
        o.cube("order_year", "priority")
        .agg(
            F.grouping_id().alias("grp_id"),
            F.count("*").alias("n_orders"),
            F.sum("cents").alias("revenue_cents"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
        .select(
            "order_year", "priority", "grp_id",
            "n_orders", "revenue_cents", "n_customers",
        )
    )


_CUBE_ORACLE = """
SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       o_orderpriority AS priority,
       CAST(GROUPING(year(o_orderdate), o_orderpriority) AS BIGINT) AS grp_id,
       CAST(count(*) AS BIGINT) AS n_orders,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS revenue_cents,
       CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders
GROUP BY CUBE (year(o_orderdate), o_orderpriority)
"""


def _profile_select(name: str, expr: str) -> str:
    return f"""
SELECT '{name}' AS col_name,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(count(*) - count({expr}) AS BIGINT) AS n_null,
       CAST(count(DISTINCT {expr}) AS BIGINT) AS n_distinct,
       CAST(min({expr}) AS VARCHAR) AS min_repr,
       CAST(max({expr}) AS VARCHAR) AS max_repr
FROM orders"""



SKETCH_K = 64  # bottom-k sample size per month


def orders_quantiles_sketch(
    spark: SparkSession, sf_dir: str | None = None
) -> DataFrame:
    """Per-month quantile ESTIMATION from a deterministic bottom-k
    sample (r7) — the constant-memory-per-group companion to
    `orders_quantiles`' exact value-domain method. Keep the K orders
    with the smallest fixed-hash values (a uniform random sample any
    engine can replay: h = (key % M · A + B) % M, the KMV constants),
    then read p50/p90/p99 off the SAMPLE's ascending cents at rank
    ceil(q·k). `approx_percentile`'s GK sketch is engine-internal (no
    cross-engine oracle); bottom-k under a fixed hash is bit-identical
    in DuckDB — and samples from disjoint partitions merge by keeping
    the K smallest of the union, the same mergeability that makes KMV
    a warehouse primitive. Exact quantiles (from the value-domain
    method) and the estimator's p90 basis-point error ship in the same
    row, so estimation QUALITY is driver-verified too.

    Plan shape for 100 TB: the bottom-k rank runs through
    WindowGroupLimit — each map task keeps its own K smallest rows
    BEFORE the (month)-key exchange, so the shuffle carries
    O(K · tasks) rows, never the fact table; every later window runs
    over the ≤K-row samples (W2 contract). Hash ties cannot occur
    (order keys are unique and below M, so h is injective); the
    in-sample sort is totally ordered by (cents, h)."""
    from pyspark.sql import Window

    orders = load_table(spark, "orders", sf_dir).selectExpr(
        "date_format(o_orderdate, 'yyyy-MM') as month",
        "cast(round(o_totalprice * 100) as bigint) as cents",
        f"((o_orderkey % {KMV_M}) * {KMV_A} + {KMV_B}) % {KMV_M} as h",
    )
    bottom_w = Window.partitionBy("month").orderBy("h")
    sample = (
        orders.withColumn("rn", F.row_number().over(bottom_w))
        .where(F.col("rn") <= SKETCH_K)
        .drop("rn")
    )
    rank_w = Window.partitionBy("month").orderBy("cents", "h")
    k_w = Window.partitionBy("month")
    ranked = sample.withColumn("srn", F.row_number().over(rank_w)).withColumn(
        "k", F.count(F.lit(1)).over(k_w)
    )
    est_cols = [
        F.min(
            F.when(
                F.col("srn") >= F.expr(f"(k * {q} + 99) div 100"),
                F.col("cents"),
            )
        ).alias(f"p{q}_est")
        for q in QUANTILES_BP
    ]
    est = ranked.groupBy("month").agg(
        F.max("k").alias("k_sample"), *est_cols
    )
    exact = orders_quantiles(spark, sf_dir)
    return (
        est.join(exact, "month")
        .withColumn(
            "p90_err_bp",
            F.expr("abs(p90_est - p90_cents) * 10000 div p90_cents"),
        )
        .select(
            "month",
            "n_orders",
            "k_sample",
            *[c for q in QUANTILES_BP for c in (f"p{q}_cents", f"p{q}_est")],
            "p90_err_bp",
        )
    )


def _quantiles_sketch_oracle() -> str:
    exact = _quantiles_oracle()
    quantile_sel = ", ".join(
        f"""min(CASE WHEN srn >= (k * {q} + 99) // 100 THEN cents END)
            AS p{q}_est"""
        for q in QUANTILES_BP
    )
    return f"""
WITH o AS (
    SELECT strftime(o_orderdate, '%Y-%m') AS month,
           CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
           ((o_orderkey % {KMV_M}) * {KMV_A} + {KMV_B}) % {KMV_M} AS h
    FROM orders
),
bk AS (
    SELECT month, cents, h,
           row_number() OVER (PARTITION BY month ORDER BY h) AS rn
    FROM o
),
sample AS (SELECT month, cents, h FROM bk WHERE rn <= {SKETCH_K}),
ranked AS (
    SELECT month, cents,
           row_number() OVER (PARTITION BY month ORDER BY cents, h) AS srn,
           count(*) OVER (PARTITION BY month) AS k
    FROM sample
),
est AS (
    SELECT month, CAST(max(k) AS BIGINT) AS k_sample, {quantile_sel}
    FROM ranked GROUP BY month
),
exact AS ({exact})
SELECT e.month, x.n_orders, e.k_sample,
       {", ".join(f"x.p{q}_cents, e.p{q}_est" for q in QUANTILES_BP)},
       CAST(abs(e.p90_est - x.p90_cents) * 10000 // x.p90_cents AS BIGINT)
           AS p90_err_bp
FROM est e JOIN exact x ON e.month = x.month
"""

ORACLES: dict[str, str] = {
    "orders_profile": " UNION ALL ".join(
        _profile_select(name, expr) for name, expr in _SPECS
    ),
    "orders_quantiles": _quantiles_oracle(),
    "events_distinct_kmv": _kmv_oracle(),
    "orders_cube_summary": _CUBE_ORACLE,
    "orders_quantiles_sketch": _quantiles_sketch_oracle(),
}
