"""Semantic/metric layer (SURVEY §2.10, M1–M7).

The reference declares semantic models (entities / dimensions / measures)
and metrics (simple / ratio / derived / cumulative, with filters and
offset windows) in YAML over the marts, compiled to GROUP BY queries at
request time (models/marts/orders.yml:54-159, order_items.yml:43-181,
customers.yml:35-109). Our analogue: the same declarations as Python
dataclasses, compiled by `MetricQuery` into ONE DataFrame —

    mart → [filtered] measure aggregation by resolved dimensions
         → post-aggregation metric expressions (ratio/derived)
         → time windows (cumulative / offset) over the aggregated grain.

Design notes for scale:
* simple-metric filters compile to CASE-inside-aggregate (one pass, no
  per-metric scans) — A3/A4 in the operator inventory.
* cumulative/offset windows order by metric_time over the *aggregated*
  result (cardinality = #periods, not #rows), so the unpartitioned
  window is safe by construction (SURVEY §7.4).
* every expression is declared as a (spark_sql, duck_sql) pair — usually
  the identical string — so the compiler emits both the DataFrame plan
  and the DuckDB oracle from one declaration. Exact parity, no drift.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Dimension:
    """Categorical dimension (M1). expr defaults to the column name."""

    name: str
    expr: str | None = None

    def sql(self) -> str:
        return self.expr or self.name


@dataclass(frozen=True)
class Measure:
    """Aggregatable measure (M1/A12): agg ∈ sum, count, count_distinct,
    avg, avg_q9, median over a row-level expression.

    `avg` requires an INTEGER row expression (exact sum, one division).
    `avg_q9` is the float-typed variant: the row value is quantized to
    1e-9 before an exact integer sum, so the average is identical under
    ANY grouping and shuffle order in both engines — engine-native avg()
    over doubles accumulates in partition order and diverges in the last
    ulp for multi-row groups (caught by property-based testing)."""

    name: str
    agg: str
    expr: str
    duck_expr: str | None = None  # only when the dialect differs

    def agg_sql(self, dialect: str, filter_sql: str | None) -> str:
        e = self.expr if dialect == "spark" else (self.duck_expr or self.expr)
        if filter_sql:
            e = f"case when {filter_sql} then {e} end"
        if self.agg == "sum":
            inner = f"sum({e})"
            # DuckDB sum(BIGINT) returns HUGEINT; pin both engines to BIGINT
            return f"cast({inner} as bigint)" if dialect == "duck" else inner
        if self.agg == "count":
            return f"count({e})"
        if self.agg == "count_distinct":
            return f"count(distinct {e})"
        if self.agg == "avg":
            # exact integer sum, then one correctly-rounded division —
            # engine-native avg() may accumulate in fp (order-dependent)
            return f"cast(sum({e}) as double) / cast(count({e}) as double)"
        if self.agg == "avg_q9":
            q = f"cast(round(({e}) * 1e9) as bigint)"
            inner = f"sum({q})"
            if dialect == "duck":
                inner = f"cast({inner} as bigint)"
            return (
                f"cast({inner} as double) / 1e9"
                f" / cast(count({q}) as double)"
            )
        if self.agg == "median":
            return f"median({e})"
        raise ValueError(f"unknown agg {self.agg!r}")


@dataclass(frozen=True)
class Metric:
    """M2–M5. kinds:
    * simple      — aggregate `measure`, optional row filter (P6)
    * ratio       — numerator / denominator (both metric names)
    * derived     — post-aggregation `expr` over sibling metric names;
                    offset inputs appear as lag_1(<metric>)
    * cumulative  — running sum of `measure`'s simple metric over
                    metric_time
    """

    name: str
    kind: str = "simple"
    measure: str | None = None
    filter: str | None = None          # row-level, pre-aggregation
    duck_filter: str | None = None
    numerator: str | None = None
    denominator: str | None = None
    expr: str | None = None            # derived: over metric names
    offset_inputs: tuple[str, ...] = ()  # metrics consumed at 1-period lag


@dataclass(frozen=True)
class EntityPath:
    """Multi-hop entity link (r10 — MetricFlow's OTHER resolution path,
    VERDICT r9 item 4): a request like order_items metrics grouped by
    ``location__location_name`` reaches a dimension declared on ANOTHER
    semantic model by walking entity (foreign-key) hops:
    order_items.order_id → orders.location_id → locations.

    ``hops`` is the chain as (join_key, target SemanticModel) pairs; the
    join key must be a column of the CURRENT frame and the PRIMARY
    entity (unique key) of the target's mart — MetricFlow's declared-
    entity contract, which is what makes the left joins fan-out-free.
    The group_by dimension after the ``<name>__`` prefix must be a
    declared dimension of the LAST hop's model."""

    name: str
    hops: tuple  # ((key_col, SemanticModel), ...)


@dataclass(frozen=True)
class SemanticModel:
    """M1: a mart + its declared dimensions/measures/metrics."""

    name: str
    mart: str                       # jaffle model name (oracle CTE source)
    base: object                    # (spark, sf_dir) -> DataFrame
    agg_time_dimension: str         # column holding event time
    dimensions: dict[str, Dimension] = field(default_factory=dict)
    measures: dict[str, Measure] = field(default_factory=dict)
    metrics: dict[str, Metric] = field(default_factory=dict)
    entity_paths: dict[str, EntityPath] = field(default_factory=dict)


# date_trunc grains with identical semantics in Spark and DuckDB.
# quarter/year added r7 — the reference's own seasonal analyses
# (products.sql:75-76, time_analytics.sql:69-71) make quarter the next
# grain a metrics user reaches for after month.
GRAIN_OK = ("day", "week", "month", "quarter", "year")


class MetricQuery:
    """Compile (metrics × group_by [× where]) into one DataFrame and the
    matching DuckDB oracle SQL (M6 saved queries are frozen instances)."""

    def __init__(
        self,
        model: SemanticModel,
        metrics: list[str],
        group_by: list[str],
        where: str | None = None,
        duck_where: str | None = None,
    ):
        self.model = model
        self.metrics = metrics
        self.group_by = group_by
        self.where = where
        self.duck_where = duck_where
        for m in metrics:
            if m not in model.metrics:
                raise KeyError(f"unknown metric {m!r} in model {model.name}")

    # ------------------------------------------------------- resolution

    def _entity_dim(self, g: str) -> tuple[EntityPath, Dimension] | None:
        """``<entity>__<dimension>`` group_bys resolve through a declared
        EntityPath to a dimension of the path's terminal model; returns
        None for local dimensions / metric_time."""
        if g.startswith("metric_time__") or "__" not in g:
            return None
        prefix, dim_name = g.split("__", 1)
        path = self.model.entity_paths.get(prefix)
        if path is None:
            raise KeyError(
                f"group_by {g!r}: model {self.model.name} declares no "
                f"entity path {prefix!r}"
            )
        terminal = path.hops[-1][1]
        dim = terminal.dimensions.get(dim_name)
        if dim is None:
            raise KeyError(
                f"group_by {g!r}: model {terminal.name} (terminal of "
                f"entity path {prefix!r}) declares no dimension {dim_name!r}"
            )
        return path, dim

    def _dims(self, dialect: str) -> list[tuple[str, str]]:
        """[(output_name, sql_expr)] — resolves metric_time__grain (M7)
        and entity-pathed foreign dimensions (the joined projection
        aliases those to the full group_by name, so the expr is just the
        name in both dialects)."""
        out = []
        for g in self.group_by:
            if g.startswith("metric_time__"):
                grain = g.removeprefix("metric_time__")
                if grain not in GRAIN_OK:
                    raise ValueError(f"unsupported grain {grain!r}")
                t = self.model.agg_time_dimension
                expr = f"cast(date_trunc('{grain}', {t}) as date)"
                out.append(("metric_time", expr))
            elif self._entity_dim(g) is not None:
                out.append((g, g))
            else:
                dim = self.model.dimensions[g]
                out.append((dim.name, dim.sql()))
        return out

    def _entity_joins(self) -> list[tuple[EntityPath, list[tuple[str, Dimension]]]]:
        """The entity hops this request needs, grouped by path so two
        dimensions of the same foreign model share one join chain:
        [(path, [(output_name, Dimension), ...])]."""
        by_prefix: dict[str, tuple[EntityPath, list[tuple[str, Dimension]]]] = {}
        for g in self.group_by:
            hit = self._entity_dim(g)
            if hit is None:
                continue
            path, dim = hit
            by_prefix.setdefault(path.name, (path, []))[1].append((g, dim))
        return list(by_prefix.values())

    def _needed_simple(self) -> list[str]:
        """Simple/input metric names required by the request, in stable
        order: requested simples first, then ratio/derived inputs."""
        needed: list[str] = []

        def add(name: str) -> None:
            if name not in needed:
                needed.append(name)

        for m in self.metrics:
            met = self.model.metrics[m]
            if met.kind == "simple":
                add(m)
            elif met.kind == "ratio":
                add(met.numerator)
                add(met.denominator)
            elif met.kind == "cumulative":
                add(met.measure)
            elif met.kind == "derived":
                for inp in met.offset_inputs:
                    add(inp)
                # non-offset inputs must be declared simple metrics named
                # inside expr; callers list them via offset_inputs or the
                # expr references requested simples — collect by scan:
                for name, cand in self.model.metrics.items():
                    if cand.kind == "simple" and name in (met.expr or ""):
                        add(name)
        return needed

    # ------------------------------------------------------ spark plan

    def to_df(self, spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
        from ..models.base import ref

        # Resolve the mart through ref() (r14): inside a pipeline run or
        # a digest-group materialization context the request reads the
        # already-materialized/cached mart instead of replanning its
        # whole upstream join tree (standalone behavior unchanged —
        # ref() falls back to the builder). This is what makes the
        # export phase of run_pipeline read the WRITTEN mart and the
        # rollups-digest semantic members share one cached orders
        # subtree instead of rebuilding the lineage per member.
        df = ref(self.model.mart, self.model.base, spark, sf_dir)
        # Entity-pathed dimensions join BEFORE aggregation: each hop is a
        # key-equi left join against the target mart PROJECTED down to
        # (its key, the next hop's key | the requested dim exprs) — no
        # payload columns ride along, so a dimension-model hop is a
        # broadcast join at any fact size and a fact-model hop (e.g.
        # order_items→orders) shuffles only two narrow key columns. The
        # declared-primary-entity contract makes every hop fan-out-free.
        for path, dims in self._entity_joins():
            for i, (key, target) in enumerate(path.hops):
                tgt = ref(target.mart, target.base, spark, sf_dir)
                # Every hop ADDS columns to the running frame (the next
                # hop's key, or the aliased output dims). If the base
                # mart already defines a same-named column, the next
                # join (Spark) — and the oracle's chained USING —
                # becomes AMBIGUOUS_REFERENCE; nothing in the declared
                # jaffle paths trips this, but a future EntityPath
                # declaration could, so fail loudly at resolution time
                # instead (r10 advisor finding).
                if i + 1 < len(path.hops):
                    added = [path.hops[i + 1][0]]
                    proj = tgt.select(key, *added)
                else:
                    added = [out for out, _ in dims]
                    proj = tgt.select(
                        key,
                        *[
                            F.expr(dim.sql()).alias(out)
                            for out, dim in dims
                        ],
                    )
                clash = [c for c in added if c in df.columns]
                if clash:
                    raise ValueError(
                        f"entity path {path.name!r}: hop {i} over "
                        f"{key!r} would add column(s) {clash} that the "
                        f"frame already defines — rename the base "
                        f"column or alias the hop key/dimension"
                    )
                df = df.join(proj, key, "left")
        if self.where:
            df = df.where(F.expr(self.where))

        dims = self._dims("spark")
        dim_cols = [F.expr(e).alias(n) for n, e in dims]
        aggs: list[Column] = []
        for name in self._needed_simple():
            met = self.model.metrics[name]
            meas = self.model.measures[met.measure]
            aggs.append(
                F.expr(meas.agg_sql("spark", met.filter)).alias(name)
            )
        grouped = df.groupBy(*dim_cols).agg(*aggs) if dim_cols else df.agg(*aggs)

        # post-aggregation phase (ratio / derived / cumulative / offset).
        # Time windows partition by every non-time dimension: with e.g.
        # group_by [metric_time__week, location] the lag/running-sum must
        # advance along time WITHIN each location, not across interleaved
        # (time, location) rows. Cardinality per partition = #periods, so
        # the window stays safe at scale (SURVEY §7.4) — and partitioned
        # windows also drop the single-partition WindowExec warning.
        other_dims = [n for n, _ in self._dims("spark") if n != "metric_time"]
        needs_time = any(
            self.model.metrics[m].kind == "cumulative"
            or self.model.metrics[m].offset_inputs
            for m in self.metrics
        )
        if needs_time and "metric_time" not in [n for n, _ in dims]:
            raise ValueError(
                "cumulative/offset metrics require a metric_time group_by"
            )
        w_time = (
            Window.partitionBy(*other_dims).orderBy("metric_time")
            if other_dims
            else Window.orderBy("metric_time")
        )
        for name in self.metrics:
            met = self.model.metrics[name]
            if met.kind == "simple":
                continue
            if met.kind == "ratio":
                grouped = grouped.withColumn(
                    name,
                    F.col(met.numerator).cast("double")
                    / F.col(met.denominator).cast("double"),
                )
            elif met.kind == "cumulative":
                grouped = grouped.withColumn(
                    name,
                    F.sum(met.measure).over(
                        w_time.rowsBetween(Window.unboundedPreceding, 0)
                    ),
                )
            elif met.kind == "derived":
                tmp = grouped
                expr = met.expr
                for inp in met.offset_inputs:
                    lag_name = f"lag_1_{inp}"
                    tmp = tmp.withColumn(lag_name, F.lag(inp, 1).over(w_time))
                    expr = expr.replace(f"lag_1({inp})", lag_name)
                grouped = tmp.withColumn(name, F.expr(expr))
                grouped = grouped.drop(
                    *[f"lag_1_{inp}" for inp in met.offset_inputs]
                )
        out_cols = [n for n, _ in self._dims("spark")] + list(self.metrics)
        return grouped.select(*out_cols)

    # ----------------------------------------------------- duckdb oracle

    def to_oracle_sql(self) -> str:
        from ..queries.oracle_jaffle import jaffle_sql, jaffle_sql_multi

        hop_marts = self.hop_marts()
        if hop_marts:
            seen: list[str] = []
            for m in [self.model.mart, *hop_marts]:
                if m not in seen:
                    seen.append(m)
            return jaffle_sql_multi(seen, self._oracle_select())
        return jaffle_sql(self.model.mart, extra_select=self._oracle_select())

    def hop_marts(self) -> list[str]:
        """Mart names of every entity-hop model this request joins —
        their CTE chains must be in scope for _oracle_select."""
        return [
            target.mart
            for path, _dims in self._entity_joins()
            for _key, target in path.hops
        ]

    def _oracle_select(self) -> str:
        """The request's final SELECT, assuming the mart's CTE chain is
        already in scope — the composable half of to_oracle_sql, shared
        with MultiModelMetricQuery (which provides ONE chain covering
        every requested mart)."""
        from ..queries.oracle_jaffle import _CTE_NAME

        src = _CTE_NAME.get(self.model.mart, self.model.mart)
        # entity hops: LEFT JOIN each hop's mart CTE projected to (key,
        # next key | aliased dim exprs) — the exact twin of to_df's joins
        for path, dims_of in self._entity_joins():
            for i, (key, target) in enumerate(path.hops):
                cte = _CTE_NAME.get(target.mart, target.mart)
                if i + 1 < len(path.hops):
                    cols = f"{key}, {path.hops[i + 1][0]}"
                else:
                    cols = f"{key}, " + ", ".join(
                        f"{dim.sql()} AS {out}" for out, dim in dims_of
                    )
                src += (
                    f" LEFT JOIN (SELECT {cols} FROM {cte}) "
                    f"hop_{path.name}_{i} USING ({key})"
                )
        dims = self._dims("duck")
        dim_sql = [f"{e} AS {n}" for n, e in dims]
        agg_sql = []
        for name in self._needed_simple():
            met = self.model.metrics[name]
            meas = self.model.measures[met.measure]
            agg_sql.append(
                f"{meas.agg_sql('duck', met.duck_filter or met.filter)} AS {name}"
            )
        where = f"WHERE {self.duck_where or self.where}" if self.where else ""
        group = (
            "GROUP BY " + ", ".join(str(i + 1) for i in range(len(dims)))
            if dims
            else ""
        )
        inner = (
            f"SELECT {', '.join(dim_sql + agg_sql)} FROM {src} {where} {group}"
        )

        other_dims = [n for n, _ in dims if n != "metric_time"]
        over_time = (
            f"PARTITION BY {', '.join(other_dims)} ORDER BY metric_time"
            if other_dims
            else "ORDER BY metric_time"
        )
        post: list[str] = []
        for name in self.metrics:
            met = self.model.metrics[name]
            if met.kind == "simple":
                continue
            if met.kind == "ratio":
                post.append(
                    f"CAST({met.numerator} AS DOUBLE)"
                    f" / CAST({met.denominator} AS DOUBLE) AS {name}"
                )
            elif met.kind == "cumulative":
                post.append(
                    f"CAST(sum({met.measure}) OVER ({over_time}"
                    f" ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
                    f" AS BIGINT) AS {name}"
                )
            elif met.kind == "derived":
                expr = met.expr if met.expr else name
                for inp in met.offset_inputs:
                    expr = expr.replace(
                        f"lag_1({inp})",
                        f"lag({inp}, 1) OVER ({over_time})",
                    )
                post.append(f"{expr} AS {name}")

        out_names = [n for n, _ in dims] + list(self.metrics)
        if post:
            keep = [n for n, _ in dims] + self._needed_simple()
            outer_cols = ", ".join(keep_n for keep_n in keep) + (
                ", " + ",\n       ".join(post) if post else ""
            )
            return (
                f"SELECT {', '.join(out_names)} FROM "
                f"(SELECT {outer_cols} FROM (\n{inner}\n) g) h"
            )
        return f"SELECT {', '.join(out_names)} FROM (\n{inner}\n) g"


class MultiModelMetricQuery:
    """Ad-hoc multi-metric request ACROSS semantic models (r9 —
    MetricFlow's join-resolution core, VERDICT r8 item 7): metrics drawn
    from several models in one request, as long as every sub-request
    shares the same group_by output shape (e.g. metric_time__month, or
    a dimension both models declare under the same name).

    Resolution is MetricFlow's: each model aggregates ITS OWN metrics at
    the requested grain independently (its own filters/windows/ratios —
    the full MetricQuery machinery), then the per-model aggregate frames
    FULL-OUTER-join on the shared group_by columns, so a period present
    in one model but absent from the other still surfaces (with NULL for
    the missing side) instead of silently dropping.

    Scale: the join keys are the AGGREGATED dimensions — cardinality =
    #periods × #dimension values, thousands of rows where the marts have
    billions — so the join is broadcast-class by construction no matter
    how large the underlying marts are; each mart is scanned exactly
    once by its own aggregation."""

    def __init__(self, requests: list[MetricQuery]):
        if len(requests) < 2:
            raise ValueError("MultiModelMetricQuery needs >= 2 requests")
        self.dim_names = [n for n, _ in requests[0]._dims("spark")]
        for r in requests[1:]:
            # compare the RAW group_by, not the resolved output names:
            # metric_time__month and metric_time__week both resolve to a
            # `metric_time` column, but joining a month grain against a
            # week grain would be a silent semantic error
            if r.group_by != requests[0].group_by:
                raise ValueError(
                    "group_by shapes differ: "
                    f"{requests[0].group_by} vs {r.group_by}"
                )
        flat = [m for r in requests for m in r.metrics]
        if len(set(flat)) != len(flat):
            raise ValueError(f"duplicate metric names across models: {flat}")
        self.requests = requests
        self.metric_names = flat

    def to_df(self, spark: SparkSession, sf_dir: str | None = None) -> DataFrame:
        out = None
        for r in self.requests:
            df = r.to_df(spark, sf_dir)
            # list-of-names join: Spark coalesces the key columns, the
            # exact semantics of SQL FULL JOIN ... USING in the oracle
            out = df if out is None else out.join(df, self.dim_names, "outer")
        return out.select(*self.dim_names, *self.metric_names)

    def oracle_final_select(self) -> str:
        """The composed FULL-JOIN SELECT, assuming every requested
        mart's CTE chain is already in scope — the composable half of
        to_oracle_sql, embeddable as a digest-member subquery."""
        using = ", ".join(self.dim_names)
        frm = f"(\n{self.requests[0]._oracle_select()}\n) q0"
        for i, r in enumerate(self.requests[1:], start=1):
            frm += (
                f"\nFULL JOIN (\n{r._oracle_select()}\n) q{i}"
                f" USING ({using})"
            )
        return f"SELECT {using}, {', '.join(self.metric_names)} FROM {frm}"

    @property
    def marts(self) -> list[str]:
        return [r.model.mart for r in self.requests]

    def to_oracle_sql(self) -> str:
        from ..queries.oracle_jaffle import jaffle_sql_multi

        return jaffle_sql_multi(self.marts, self.oracle_final_select())
