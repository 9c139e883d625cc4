"""Property-based tests (hypothesis) — a test dimension the reference
lacks entirely (SURVEY §5 'Absent'). Two surfaces where randomized
inputs genuinely strengthen coverage:

* the metric compiler: ANY subset of metrics × group-by must compile to
  a DataFrame that matches its own generated DuckDB oracle, not just the
  frozen saved queries;
* cross-operator invariants that must hold for any data the operators
  accept (sessionization conservation, dedup candidate containment).
"""

from __future__ import annotations

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from conftest import assert_parity

from dbt_jaffleshop_spark.semantic import ORDERS_MODEL, MetricQuery
from dbt_jaffleshop_spark.semantic.jaffle_models import (
    CUSTOMER_SEGMENTATION_MODEL,
    CUSTOMERS_MODEL,
    LOCATIONS_MODEL,
    ORDER_ITEMS_MODEL,
    PRODUCTS_MODEL,
    SUPPLIES_MODEL,
    TIME_ANALYTICS_MODEL,
)

_ORDER_METRICS = sorted(ORDERS_MODEL.metrics)
_GROUP_BYS = [[], ["metric_time__month"], ["location"], ["is_food_order"],
              ["metric_time__week", "location"]]

_prop_settings = settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(
    metrics=st.lists(st.sampled_from(_ORDER_METRICS), min_size=1, max_size=4,
                     unique=True),
    group_by=st.sampled_from(_GROUP_BYS),
)
@_prop_settings
def test_metric_compiler_parity_any_request(spark, oracle, sf_dir, metrics, group_by):
    """Every compilable (metrics × group_by) request must match the
    oracle generated from the same declaration."""
    needs_time = any(
        ORDERS_MODEL.metrics[m].kind in ("cumulative",)
        or ORDERS_MODEL.metrics[m].offset_inputs
        for m in metrics
    )
    if needs_time and not any(g.startswith("metric_time") for g in group_by):
        group_by = ["metric_time__month"]
    q = MetricQuery(ORDERS_MODEL, metrics=list(metrics), group_by=list(group_by))
    assert_parity(q.to_df(spark, sf_dir), oracle, q.to_oracle_sql())


_ALL_MODELS = [
    ORDERS_MODEL, CUSTOMERS_MODEL, ORDER_ITEMS_MODEL, PRODUCTS_MODEL,
    SUPPLIES_MODEL, LOCATIONS_MODEL, CUSTOMER_SEGMENTATION_MODEL,
    TIME_ANALYTICS_MODEL,
]


@st.composite
def _any_model_request(draw):
    model = draw(st.sampled_from(_ALL_MODELS))
    metrics = draw(
        st.lists(st.sampled_from(sorted(model.metrics)), min_size=1,
                 max_size=3, unique=True)
    )
    dims = sorted(model.dimensions)
    choices = [[d] for d in dims] + [[]]
    if model.agg_time_dimension:
        choices += [["metric_time__month"], ["metric_time__month"] + dims[:1]]
    group_by = list(draw(st.sampled_from([tuple(c) for c in choices])))
    needs_time = any(
        model.metrics[m].kind == "cumulative" or model.metrics[m].offset_inputs
        for m in metrics
    )
    if needs_time:
        if not model.agg_time_dimension:
            metrics = [m for m in metrics
                       if model.metrics[m].kind != "cumulative"
                       and not model.metrics[m].offset_inputs] or ["__drop__"]
        elif not any(g.startswith("metric_time") for g in group_by):
            group_by = ["metric_time__month"] + group_by
    return model, metrics, group_by


@given(req=_any_model_request())
@_prop_settings
def test_metric_compiler_parity_all_models(spark, oracle, sf_dir, req):
    """The compiler invariant holds across ALL EIGHT declared semantic
    models, not just orders: any metrics × group_by request matches its
    own generated oracle."""
    model, metrics, group_by = req
    if metrics == ["__drop__"]:
        return  # nothing compilable drawn for a time-less model
    q = MetricQuery(model, metrics=metrics, group_by=group_by)
    assert_parity(q.to_df(spark, sf_dir), oracle, q.to_oracle_sql())


def test_sessionize_conserves_events(spark, sf_dir):
    """Σ session n_events == |events| and every intra-session gap bound
    implies duration ≤ (n_events − 1) × gap."""
    from dbt_jaffleshop_spark.llm.events import SESSION_GAP_US, events_sessionize
    from dbt_jaffleshop_spark.sources import load_table
    from pyspark.sql import functions as F

    sessions = events_sessionize(spark, sf_dir)
    total = sessions.agg(F.sum("n_events")).collect()[0][0]
    assert total == load_table(spark, "events", sf_dir).count()
    bad = sessions.where(
        F.col("duration_us") > (F.col("n_events") - 1) * SESSION_GAP_US
    ).count()
    assert bad == 0


def test_lsh_candidates_subset_of_exact(spark, sf_dir):
    """Verified LSH pairs are always a subset of exact-Jaccard pairs at
    the same threshold (the verify step guarantees no false positives)."""
    from dbt_jaffleshop_spark.llm.dedup import dedup_minhash_pairs, dedup_ngram_jaccard

    exact = {(r["doc_a"], r["doc_b"]) for r in dedup_ngram_jaccard(spark, sf_dir).collect()}
    lsh = {(r["doc_a"], r["doc_b"]) for r in dedup_minhash_pairs(spark, sf_dir).collect()}
    assert lsh <= exact


@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),
            st.integers(min_value=0, max_value=40),
        ).filter(lambda e: e[0] != e[1]),
        min_size=1,
        max_size=60,
    )
)
@_prop_settings
def test_clusters_star_equals_propagation_any_graph(spark, edges):
    """Property: on ANY random graph, large-star/small-star contraction
    and min-label propagation assign identical (doc_id, cluster_id,
    cluster_size) — the two connected-components implementations are
    interchangeable."""
    from unittest import mock

    from dbt_jaffleshop_spark.llm import dedup

    pairs = [(min(a, b), max(a, b)) for a, b in edges]
    pair_df = spark.createDataFrame(
        sorted(set(pairs)), "doc_a long, doc_b long"
    )
    # feed BOTH consumers the same graph: since r9, dedup_clusters
    # consumes the star-reduced relation while the propagation
    # cross-check deliberately keeps the all-pairs input
    with mock.patch.object(
        dedup, "dedup_minhash_pairs", lambda _s, _sf=None: pair_df
    ), mock.patch.object(
        dedup, "dedup_minhash_star_pairs", lambda _s, _sf=None: pair_df
    ):
        a = sorted(map(tuple, dedup.dedup_clusters_propagation(spark, None).collect()))
        b = sorted(map(tuple, dedup.dedup_clusters(spark, None).collect()))
    assert a == b


@given(
    runs=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=6),          # key
                st.sampled_from(["a", "b", "c"]),               # checked col
                st.integers(min_value=0, max_value=99),         # payload
            ),
            min_size=0,
            max_size=6,
            unique_by=lambda r: r[0],
        ),
        min_size=1,
        max_size=4,
    ),
)
@_prop_settings
def test_snapshot_fold_invariants_any_run_sequence(spark, runs):
    """SCD2 fold invariants for ANY sequence of source states (dbt check
    strategy):

    * per key: exactly one open row iff the key ever appeared;
    * the open row's checked value equals the key's LAST SEEN value
      (hard deletes keep the last state open — dbt default);
    * validity intervals chain without gaps or overlaps (each next
      version opens exactly when the previous closes);
    * version count per key = 1 + number of times its checked value
      CHANGED between consecutive appearances."""
    from pyspark.sql import Row

    from dbt_jaffleshop_spark.plans.snapshots import snapshot_apply

    ts = [f"2024-0{i + 1}-01 00:00:00" for i in range(len(runs))]
    snap = None
    last_seen: dict[int, str] = {}
    changes: dict[int, int] = {}
    for state, t in zip(runs, ts):
        df = spark.createDataFrame(
            [Row(id=k, status=s, payload=p) for k, s, p in state] or [],
            "id bigint, status string, payload bigint",
        )
        snap = snapshot_apply(df, snap, "id", ["status"], t)
        for k, s, _p in state:
            if k not in last_seen:
                changes[k] = 1
            elif last_seen[k] != s:
                changes[k] = changes[k] + 1
            last_seen[k] = s

    rows = snap.collect()
    by_key: dict[int, list] = {}
    for r in rows:
        by_key.setdefault(r.id, []).append(r)
    assert set(by_key) == set(last_seen)
    for k, versions in by_key.items():
        opens = [r for r in versions if r.dbt_valid_to is None]
        assert len(opens) == 1, (k, versions)
        assert opens[0].status == last_seen[k]
        assert len(versions) == changes[k]
        # intervals chain: sort by valid_from; each close = next open
        versions.sort(key=lambda r: r.dbt_valid_from)
        for prev, nxt in zip(versions, versions[1:]):
            assert prev.dbt_valid_to == nxt.dbt_valid_from, (k, versions)
        assert versions[-1].dbt_valid_to is None


@given(
    runs=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=5),          # key
                st.sampled_from(["a", "b"]),                    # checked col
            ),
            min_size=0,
            max_size=4,
            unique_by=lambda r: r[0],
        ),
        min_size=1,
        max_size=3,
    ),
)
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_run_snapshot_acid_materialization_equals_pure_fold(
    spark, tmp_path_factory, runs
):
    """The ACID-materialized snapshot path (run_snapshot: open-partition
    rewrite + closed append, replay guard, commit retry) must store
    EXACTLY the pure snapshot_apply fold for ANY run sequence — the
    O(open+changed) partition optimization can never change the SCD2
    content. Also pins at-most-one-open-row and interval tiling on the
    STORED table, and that closed history files are never rewritten."""
    from pyspark.sql import Row

    from dbt_jaffleshop_spark.plans.acid import AcidTable
    from dbt_jaffleshop_spark.plans.snapshots import (
        SNAP_OPEN_COL,
        run_snapshot,
        snapshot_apply,
    )

    path = str(tmp_path_factory.mktemp("snap_acid") / "tbl")
    ts = [f"2024-0{i + 1}-01 00:00:00" for i in range(len(runs))]
    pure = None
    closed_files_prev: set[str] = set()
    for state, t in zip(runs, ts):
        df = spark.createDataFrame(
            [Row(id=k, status=s) for k, s in state] or [],
            "id bigint, status string",
        )
        run_snapshot(spark, path, df, "id", ["status"], t)
        pure = snapshot_apply(df, pure, "id", ["status"], t)
        table = AcidTable(path)
        closed_files = {
            f
            for f in table.manifest()["files"]
            if f"{SNAP_OPEN_COL}=n" in f.split("/")
        }
        assert closed_files_prev <= closed_files  # history immutable
        closed_files_prev = closed_files

    stored = AcidTable(path).read(spark).drop(SNAP_OPEN_COL)
    key = lambda r: (r.id, str(r.dbt_valid_from), str(r.dbt_valid_to))
    s_rows = sorted(stored.collect(), key=key)
    p_rows = sorted(pure.collect(), key=key)
    assert [tuple(r) for r in s_rows] == [tuple(r) for r in p_rows]

    by_key: dict[int, list] = {}
    for r in s_rows:
        by_key.setdefault(r.id, []).append(r)
    for k, versions in by_key.items():
        assert sum(r.dbt_valid_to is None for r in versions) == 1, k
        versions.sort(key=lambda r: r.dbt_valid_from)
        for prev, nxt in zip(versions, versions[1:]):
            assert prev.dbt_valid_to == nxt.dbt_valid_from, (k, versions)


@given(
    upserts=st.lists(
        st.lists(
            st.tuples(
                st.integers(min_value=1, max_value=8),           # key
                st.sampled_from(["p0", "p1", "p2"]),             # partition
                st.integers(min_value=0, max_value=99),          # value
            ),
            min_size=1,
            max_size=5,
            unique_by=lambda r: r[0],
        ),
        min_size=1,
        max_size=3,
    ),
)
@_prop_settings
def test_merge_rows_equals_dict_fold(spark, tmp_path_factory, upserts):
    """MERGE invariant for ANY sequence of key-unique upsert batches on
    a partitioned table: the stored state equals a plain dict fold
    (last write per key wins, including partition moves)."""
    from pyspark.sql import Row

    from dbt_jaffleshop_spark.plans.acid import AcidTable

    path = str(tmp_path_factory.mktemp("merge") / "tbl")
    table = AcidTable(path)

    def df(batch):
        return spark.createDataFrame(
            [Row(id=k, p=p, v=v) for k, p, v in batch],
            "id bigint, p string, v bigint",
        )

    table.overwrite(df(upserts[0]), partition_by=["p"])
    expect = {k: (p, v) for k, p, v in upserts[0]}
    for batch in upserts[1:]:
        table.merge_rows(spark, df(batch), "id")
        for k, p, v in batch:
            expect[k] = (p, v)

    got = {
        r.id: (r.p, r.v)
        for r in table.read(spark).select("id", "p", "v").collect()
    }
    assert got == expect


@given(
    a_rows=st.dictionaries(
        st.integers(min_value=0, max_value=12),                 # pk
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
            st.one_of(st.none(), st.sampled_from(["x", "y"])),
        ),
        max_size=10,
    ),
    b_rows=st.dictionaries(
        st.integers(min_value=0, max_value=12),
        st.tuples(
            st.one_of(st.none(), st.integers(min_value=0, max_value=3)),
            st.one_of(st.none(), st.sampled_from(["x", "y"])),
        ),
        max_size=10,
    ),
)
@_prop_settings
def test_compare_relations_summary_any_relations(spark, a_rows, b_rows):
    """Property (r6): on ANY pair of keyed relations (including NULL
    values on either side), the audit summary's PK-coverage counts
    equal the set algebra of the key sets, matched+mismatched tile the
    intersection, and per-column matched counts equal a direct Python
    reference computation with NULL-safe equality."""
    from dbt_jaffleshop_spark.testing.audit import compare_relations

    schema = "pk long, v long, s string"
    a = spark.createDataFrame(
        [(k, v, s) for k, (v, s) in sorted(a_rows.items())], schema
    )
    b = spark.createDataFrame(
        [(k, v, s) for k, (v, s) in sorted(b_rows.items())], schema
    )
    summary, mism = compare_relations(a, b, "pk", ["v", "s"])
    rows = {r.col_name: r for r in summary.collect()}

    ka, kb = set(a_rows), set(b_rows)
    both = ka & kb
    if not (ka | kb):
        assert not rows  # two empty relations produce an empty audit
        return
    for ci, col in enumerate(["v", "s"]):
        r = rows[col]
        assert r.n_pk_only_a == len(ka - kb)
        assert r.n_pk_only_b == len(kb - ka)
        assert r.n_pk_both == len(both)
        assert r.n_matched + r.n_mismatched == r.n_pk_both
        expected_matched = sum(
            1 for k in both if a_rows[k][ci] == b_rows[k][ci]
        )
        assert r.n_matched == expected_matched
        if r.n_pk_both:
            assert r.match_bp == r.n_matched * 10000 // r.n_pk_both
        else:
            assert r.match_bp is None
    # the mismatch relation is exactly the complement of the matches
    mism_keys = {(r.col_name, r.pk) for r in mism.collect()}
    expected_mism = {
        (col, k)
        for ci, col in enumerate(["v", "s"])
        for k in both
        if a_rows[k][ci] != b_rows[k][ci]
    }
    assert mism_keys == expected_mism
