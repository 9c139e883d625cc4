#!/usr/bin/env python
"""A/B: partition-scoped removal I/O vs corpus size (r11, VERDICT r10
item 1's "done" bar: files WRITTEN by remove_docs must track the
affected partitions, not the corpus).

Setup per corpus scale (sf0.01 ≈ 1×, sf0.1 ≈ 10× documents):

* build the dedup index over the full documents table (one-time cost,
  not what's measured);
* remove a FIXED-SHAPE set: the 24 smallest doc_ids with
  doc_id % N_DOC_BUCKETS == 3 — every removed id lives in ONE p_bucket
  partition, so the shingles/bands replace set is exactly one
  partition at both scales;
* record, per index table: files in the live snapshot BEFORE the
  removal, files WRITTEN by the removal commit (manifest diff), and
  files carried by reference — plus wall time.

Pass bar: files_written stays ~flat from 1× to 10× (bounded by the
affected-partition count) while files_before grows with the corpus —
i.e. the r10 full-table-rewrite behavior (files_written ==
files_after) is gone. Results recorded in BASELINE.md round-11 notes.

Usage: python scripts/removal_ab.py [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

REMOVE_BUCKET = 3
REMOVE_CAP = 24


def _session(cpus: int):
    from dbt_jaffleshop_spark.session import get_spark

    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    return get_spark("removal-ab")


def run_scale(spark, sf_dir: str) -> dict:
    from dbt_jaffleshop_spark.llm import dedup_incremental as di
    from dbt_jaffleshop_spark.sources import load_table

    docs = load_table(spark, "documents", sf_dir).select("doc_id", "text")
    n_docs = docs.count()
    root = tempfile.mkdtemp(prefix="removal_ab_")
    try:
        idx = di.build_dedup_index(spark, docs, root)
        before = {
            t: set(getattr(idx, t).manifest()["files"])
            for t in idx._TABLES
        }
        rem_ids = [
            r[0]
            for r in docs.where(
                F.col("doc_id") % di.N_DOC_BUCKETS == REMOVE_BUCKET
            )
            .select("doc_id")
            .orderBy("doc_id")
            .limit(REMOVE_CAP)
            .collect()
        ]
        rem = spark.createDataFrame(
            [(i,) for i in rem_ids], "doc_id bigint"
        )
        t0 = time.perf_counter()
        di.remove_docs(spark, rem, idx)
        secs = time.perf_counter() - t0
        tables = {}
        for t in idx._TABLES:
            after = set(getattr(idx, t).manifest()["files"])
            tables[t] = {
                "files_before": len(before[t]),
                "files_written": len(after - before[t]),
                "files_carried": len(after & before[t]),
            }
        return {
            "sf_dir": sf_dir,
            "n_docs": n_docs,
            "n_removed": len(rem_ids),
            "removal_seconds": round(secs, 2),
            "tables": tables,
            "files_written_total": sum(
                v["files_written"] for v in tables.values()
            ),
            "files_before_total": sum(
                v["files_before"] for v in tables.values()
            ),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()
    spark = _session(args.cpus)
    for sf_dir in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
        print(json.dumps(run_scale(spark, sf_dir)), flush=True)


if __name__ == "__main__":
    main()
