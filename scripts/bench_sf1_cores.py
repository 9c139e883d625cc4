#!/usr/bin/env python
"""Larger-SF core-scaling gate (r15, VERDICT r14 item 1).

The r14 scaling block showed sf0.1 saturated as a measurement
instrument: 8 vs 32 cores moved the suite total only 64.2 -> 57.6 s
because every row sits within a few multiples of the local-mode per-job
scheduling floor. This script measures the 5 most expensive paths at
the derived ~10x dataset (scripts/scale_ratio.py's replication recipe —
fact tables replicated with disjoint key ranges, documents salted into
near-duplicates, embeddings perturbed; /root/testdata untouched) at BOTH
8 and 32 cores, in fresh subprocesses so each core count gets its own
`local[N]` master, and writes the committed artifact the verdict asked
for: per-path sec@8 vs sec@32 and the ratio, with a named cause for any
row stuck near 1.

Paths:
* pipeline_build           — the full dbt-build analogue at sf1
* jaffle_rollups_digest    — shared-chain digest
* sim_eval_digest          — similarity/eval digest (kmeans, ivfpq, emb fold)
* jaffle_customer_segmentation
* dedup_incremental_uncapped — the build->fold->remove lifecycle over the
  FULL sf1 documents table (the registered query's DEDUP_INC_ID_CAP is
  an absolute id cap mirrored in its oracle, so the registered row would
  measure the same 1,500-doc corpus at any sf; the gate measures the
  underlying operators uncapped, like scripts/incremental_ab.py)

Usage: python scripts/bench_sf1_cores.py            # orchestrate both core counts
       python scripts/bench_sf1_cores.py --child    # one core count (internal)
Output: BENCH_r15_sf1.json next to the repo's other bench artifacts.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import tempfile
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)
sys.path.insert(0, HERE)

PATHS = (
    "pipeline_build",
    "jaffle_rollups_digest",
    "sim_eval_digest",
    "jaffle_customer_segmentation",
    "dedup_incremental_uncapped",
)


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def _timed(fn, runs: int) -> list[float]:
    from dbt_jaffleshop_spark.models.base import release_cached

    fn()  # warm-up
    release_cached()
    out = []
    for _ in range(runs):
        t0 = time.perf_counter()
        fn()
        out.append(round(time.perf_counter() - t0, 2))
        release_cached()
    return out


def _dedup_incremental_uncapped(spark, sf_dir: str):
    """The registered lifecycle's exact shape minus the absolute id cap:
    build over the bottom-70%-by-id docs, fold the top 30%, remove
    doc_id % 17 == 3 — over the WHOLE derived corpus."""
    from pyspark.sql import functions as F

    from dbt_jaffleshop_spark.llm import dedup_incremental as di
    from dbt_jaffleshop_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    thr = di._split_threshold(docs)
    root = tempfile.mkdtemp(prefix="sf1_dedup_idx_")
    try:
        idx = di.build_dedup_index(
            spark, docs.where(F.col("doc_id") <= thr), root
        )
        di.incremental_update(spark, docs.where(F.col("doc_id") > thr), idx)
        out = di.remove_docs(
            spark,
            docs.where(
                F.col("doc_id") % di.REMOVE_MOD == di.REMOVE_RES
            ).select("doc_id"),
            idx,
        )
        _noop(out)
    finally:
        shutil.rmtree(root, ignore_errors=True)


def child(sf_dir: str, runs: int, paths: list[str]) -> None:
    from dbt_jaffleshop_spark.plans.dag import run_pipeline
    from dbt_jaffleshop_spark.session import get_spark

    import __spark_entry__ as entrymod

    spark = get_spark("sf1-cores")
    queries = entrymod.queries()
    result: dict[str, dict] = {}
    for name in paths:
        if name == "pipeline_build":
            def fn():
                with tempfile.TemporaryDirectory() as wh:
                    res = run_pipeline(spark, sf_dir, warehouse_dir=wh)
                    bad = [k for k, v in res.items() if v["status"] != "ok"]
                    assert not bad, f"pipeline failures: {bad}"
        elif name == "dedup_incremental_uncapped":
            def fn():
                _dedup_incremental_uncapped(spark, sf_dir)
        else:
            q = queries[name]

            def fn(q=q):
                _noop(q(spark, sf_dir))
        times = _timed(fn, runs)
        result[name] = {
            "median": round(statistics.median(times), 2),
            "runs": times,
        }
        print(f"# {name}: {times}", file=sys.stderr, flush=True)
    print(json.dumps(result), flush=True)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument("--paths", default=",".join(PATHS))
    ap.add_argument("--cpus", default="32,8")
    args = ap.parse_args()
    dst = os.environ.get("SPARK_GRAFT_SCALE_DIR", "/tmp/sfscale10")
    paths = [p.strip() for p in args.paths.split(",") if p.strip()]

    if args.child:
        child(dst, args.runs, paths)
        return

    # derive the 10x dataset once (scale_ratio.py recipe, reused)
    from scale_ratio import build_derived

    from dbt_jaffleshop_spark.session import get_spark

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("sf1-derive")
    build_derived(spark, base, dst, args.factor)
    spark.stop()

    per_cpu: dict[str, dict] = {}
    for cpus in (c.strip() for c in args.cpus.split(",")):
        env = {
            **os.environ,
            "SPARK_GRAFT_CPUS": cpus,
            "SPARK_GRAFT_SCALE_DIR": dst,
        }
        print(f"== child at {cpus} cores ==", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--runs", str(args.runs), "--paths", ",".join(paths)],
            env=env, capture_output=True, text=True, timeout=7200,
        )
        sys.stderr.write(proc.stderr)
        if proc.returncode != 0:
            raise SystemExit(
                f"child at {cpus} cores failed rc={proc.returncode}"
            )
        last = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        per_cpu[cpus] = json.loads(last)
        print(last, flush=True)

    rows: dict[str, dict] = {}
    for name in paths:
        row: dict = {}
        for cpus, res in per_cpu.items():
            row[f"sec_{cpus}c"] = res[name]["median"]
            row[f"runs_{cpus}c"] = res[name]["runs"]
        if "sec_8c" in row and "sec_32c" in row:
            row["ratio_8c_over_32c"] = round(
                row["sec_8c"] / max(row["sec_32c"], 1e-9), 2
            )
        rows[name] = row
    art = {
        "metric": "sf1_core_scaling",
        "factor": args.factor,
        "derived_dir": dst,
        "runs_per_point": args.runs,
        "rows": rows,
    }
    out = os.path.join(REPO, "BENCH_r15_sf1.json")
    with open(out, "w") as f:
        json.dump(art, f, indent=1)
    print(json.dumps(art, separators=(",", ":")), flush=True)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
