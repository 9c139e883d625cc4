#!/usr/bin/env python
"""sf0.1 → sf1 scaling-ratio harness (round-8, VERDICT r7 item 3).

The 100 TB story is argued from plan shape; this measures it at the
largest scale the container supports: a derived 10× dataset (sf1
equivalent) built by replicating sf0.1's FACT tables ten times with
disjoint key ranges (dimensions stay fixed — fact growth dominates
real scale-ups, and the jaffle PK/FK tests still hold: shifted
o_orderkey/l_orderkey keep order/line PKs unique, untouched custkeys
keep FKs valid). Dates are unchanged, so month-partition counts stay
constant and partitions grow 10× — exactly the shape a year of 10×
traffic has.

LLM-pipeline facts scale too, shaped to keep their workloads realistic
rather than degenerate:

* documents — doc_id shifted per replica; the text is salted with a
  per-replica suffix so replicas are NEAR-duplicates (high shingle
  overlap) instead of exact clones: the MinHash/Jaccard/SimHash pair
  builds see 10× docs with realistic duplicate structure, not a 100×
  all-pairs blow-up inside identical-text buckets.
* embeddings — vec_id shifted; each replica's vectors get a tiny
  deterministic per-replica perturbation, so LSH/IVF buckets grow ~10×
  with near-neighbor structure preserved (not 10 exact copies whose
  verify stage goes quadratic).
* events — event_id and user_id shifted per replica: 10× users with
  the same per-user session/funnel shape, the real growth mode of an
  event stream.

For every selected query (jaffle marts + pipeline_build, and/or the
headline LLM operators), this times median-of-N noop-write runs at
BOTH scales and prints per-query seconds + the sf1/sf0.1 ratio.
Linear-or-better (ratio ≲ 10× on a fixed-core box; usually much less,
since Spark amortizes fixed plan/scheduling overheads) is the pass bar
recorded in BASELINE.md.

Derivation happens ONCE into $SPARK_GRAFT_SCALE_DIR (default
/tmp/sfscale10) and is reused; /root/testdata stays untouched
(read-only). Dimension/auxiliary tables are symlinked, not copied.

Usage: python scripts/scale_ratio.py [--runs N] [--factor K]
       [--suite jaffle|llm|all]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import sys
import tempfile
import time

# key space per replica: far above any sf0.1 key, far below int64/2
REPLICA_STRIDE = 10**12
_MARKER = "_DERIVED_OK_v2"  # bump when the derivation recipe changes


def _replicate(df, k: int, table: str):
    """One replica of a fact table with per-replica key shifts and the
    realism transforms documented in the module docstring."""
    from pyspark.sql import functions as F

    if table == "orders":
        return df.withColumn("o_orderkey", F.col("o_orderkey") + F.lit(k * REPLICA_STRIDE))
    if table == "lineitem":
        return df.withColumn("l_orderkey", F.col("l_orderkey") + F.lit(k * REPLICA_STRIDE))
    if table == "documents":
        out = df.withColumn("doc_id", F.col("doc_id") + F.lit(k * REPLICA_STRIDE))
        if k == 0:
            return out
        # near-duplicate, not exact clone: suffix ~2 tokens on hundreds
        return (
            out.withColumn("text", F.concat(F.col("text"), F.lit(f" replica r{k}")))
            .withColumn("n_chars", F.length("text").cast("long"))
        )
    if table == "embeddings":
        out = df.withColumn("vec_id", F.col("vec_id") + F.lit(k * REPLICA_STRIDE))
        if k == 0:
            return out
        eps = float(k) * 1e-3
        return out.withColumn(
            "embedding",
            F.expr(f"transform(embedding, x -> cast(x + {eps} as float))"),
        )
    if table == "events":
        return df.withColumns(
            {
                "event_id": F.col("event_id") + F.lit(k * REPLICA_STRIDE),
                "user_id": F.col("user_id") + F.lit(k * REPLICA_STRIDE),
            }
        )
    raise KeyError(table)


FACT_TABLES = ("orders", "lineitem", "documents", "embeddings", "events")


def build_derived(spark, src: str, dst: str, factor: int) -> None:
    # the marker encodes the factor (advisor r8): a cached factor-10
    # derivation must not be silently reused for --factor 5
    marker = os.path.join(dst, f"{_MARKER}_f{factor}")
    if os.path.exists(marker):
        return
    os.makedirs(dst, exist_ok=True)
    for name in os.listdir(src):
        if not name.endswith(".parquet"):
            continue
        table = name[: -len(".parquet")]
        out = os.path.join(dst, name)
        if os.path.lexists(out):
            if os.path.isdir(out):
                shutil.rmtree(out)
            else:
                os.remove(out)
        if table not in FACT_TABLES:
            os.symlink(os.path.join(src, name), out)
            continue
        df = spark.read.parquet(os.path.join(src, name))
        shifted = None
        for k in range(factor):
            rep = _replicate(df, k, table)
            shifted = rep if shifted is None else shifted.unionByName(rep)
        # size write partitions for ~128 MB files at the target scale
        shifted.repartition(32).write.mode("overwrite").parquet(out)
    # clear any other-factor markers so a stale one can't validate a
    # dataset this run just overwrote
    for name in os.listdir(dst):
        if name.startswith(_MARKER) and name != os.path.basename(marker):
            os.remove(os.path.join(dst, name))
    open(marker, "w").write("ok\n")


def _force(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _median_time(fn, runs: int) -> float:
    from dbt_jaffleshop_spark.models.base import release_cached

    fn()  # warm-up (un-timed): JIT/codegen/footer caches
    release_cached()
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        times.append(time.perf_counter() - t0)
        release_cached()
    return statistics.median(times)


# the LLM operators whose scale behavior the r7 verdict flagged as the
# ones to watch: pair builds, clustering, ANN, text scans, sessionize
LLM_QUERIES = [
    "dedup_exact",
    "dedup_minhash_pairs",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_clusters",
    "dedup_embedding_lsh",
    "sim_topk_cosine",
    "sim_lsh_topk",
    "sim_ivf_topk",
    "text_quality",
    "events_sessionize",
    "events_asof_join",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--suite", choices=("jaffle", "llm", "all"), default="jaffle")
    ap.add_argument("--base", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", default=None,
                    help="comma-separated allowlist: run only these "
                         "registered queries (skips pipeline_build)")
    args = ap.parse_args()
    dst = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/sfscale10")

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dbt_jaffleshop_spark.plans.dag import run_pipeline
    from dbt_jaffleshop_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("scale-ratio")
    build_derived(spark, args.base, dst, args.factor)

    queries = entrymod.queries()
    names: list[str] = []
    if args.queries:
        names = [n.strip() for n in args.queries.split(",")]
        missing = [n for n in names if n not in queries]
        assert not missing, f"not registered: {missing}"
        args.suite = "explicit"  # skips the suite blocks + pipeline_build
    if args.suite in ("jaffle", "all"):
        names += [
            n for n in queries
            if n.startswith("jaffle_") and not n.endswith("_digest")
        ]
    if args.suite in ("llm", "all"):
        names += [n for n in LLM_QUERIES if n in queries]

    results: dict[str, dict[str, float]] = {}
    for sf_label, sf_dir in (("sf0.1", args.base), (f"sf{args.factor}x", dst)):
        for name in names:
            sec = _median_time(lambda: _force(queries[name](spark, sf_dir)), args.runs)
            results.setdefault(name, {})[sf_label] = round(sec, 2)
            print(f"{sf_label:8s} {name:35s} {sec:7.2f}s", flush=True)

        if args.suite in ("jaffle", "all"):
            def _build_once():
                wh = tempfile.mkdtemp(prefix="scale_wh_")
                try:
                    res = run_pipeline(spark, sf_dir, warehouse_dir=wh)
                    bad = {k: v for k, v in res.items() if v.get("status") not in ("ok",)}
                    assert not bad, f"pipeline failures at {sf_label}: {bad}"
                finally:
                    shutil.rmtree(wh, ignore_errors=True)

            sec = _median_time(_build_once, args.runs)
            results.setdefault("pipeline_build", {})[sf_label] = round(sec, 2)
            print(f"{sf_label:8s} {'pipeline_build':35s} {sec:7.2f}s", flush=True)

    big = f"sf{args.factor}x"
    for name, r in results.items():
        r["ratio"] = round(r[big] / max(r["sf0.1"], 1e-9), 2)
    print(json.dumps({"metric": "scale_ratio", "factor": args.factor,
                      "suite": args.suite, "results": results},
                     separators=(",", ":")))


if __name__ == "__main__":
    main()
