#!/usr/bin/env python
"""A/B: per-op files-written tracks the COMMITTED partition count (r12,
VERDICT r11 item 1's "done" bar for repartition_index).

On one corpus (sf0.01 documents) the same fixed-shape operations run
against the index at two layouts:

* build at n_doc_buckets=4, fold a delta slice, remove a fixed id set —
  record files WRITTEN per commit (manifest diff vs the pre-op live
  snapshot);
* ``repartition_index`` to n_doc_buckets=16 (one meta transaction),
  then run the SAME-SHAPE fold + removal against fresh id ranges —
  record the same counters.

Pass bar: the removal's files_written scales with the AFFECTED-partition
count under each layout (ids spread over k buckets → ~k directories'
worth of files at n=4, more-but-smaller at n=16 only insofar as the same
ids now hash into more distinct buckets), the repartition itself
rewrites every p_bucket table exactly once (full pass — inherent), and
fold cost stays delta-sized at both layouts. Logical end state is
pytest-pinned ≡ full recompute (tests/test_index_layout.py); this
script prices the I/O. Results recorded in BASELINE.md round-12 notes.

Usage: python scripts/repartition_ab.py [--cpus 32] [--sf /root/testdata/sf0.01]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _session(cpus: int):
    from dbt_jaffleshop_spark.session import get_spark

    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    return get_spark("repartition-ab")


def _files(idx) -> dict[str, set]:
    return {t: set(getattr(idx, t).manifest()["files"]) for t in idx._TABLES}


def _diff(idx, before: dict[str, set]) -> dict:
    out, total = {}, 0
    for t in idx._TABLES:
        after = set(getattr(idx, t).manifest()["files"])
        written = len(after - before[t])
        out[t] = written
        total += written
    out["total"] = total
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    spark = _session(args.cpus)

    from dbt_jaffleshop_spark.llm import dedup_incremental as di
    from dbt_jaffleshop_spark.sources import load_table

    docs = load_table(spark, "documents", args.sf).select("doc_id", "text")
    mx = int(docs.agg(F.max("doc_id")).collect()[0][0])
    # four slices: corpus | fold A | fold B, plus two removal id sets of
    # identical shape (24 ids in one residue class) drawn from the corpus
    t1, t2 = mx * 5 // 10, mx * 7 // 10
    report: dict = {"sf_dir": args.sf, "n_docs": docs.count()}

    root = tempfile.mkdtemp(prefix="repart_ab_")
    try:
        idx = di.build_dedup_index(
            spark, docs.where(F.col("doc_id") <= t1), root, n_doc_buckets=4
        )

        def _removal_set(residue: int, cap: int = 24):
            ids = [
                r[0]
                for r in docs.where(
                    (F.col("doc_id") <= t1)
                    & (F.col("doc_id") % 16 == residue)
                )
                .select("doc_id")
                .orderBy("doc_id")
                .limit(cap)
                .collect()
            ]
            return spark.createDataFrame([(i,) for i in ids], "doc_id bigint")

        for phase, n_label in (("n4", 4), ("n16", 16)):
            if n_label == 16:
                before = _files(idx)
                t0 = time.perf_counter()
                di.repartition_index(spark, idx, 16)
                report["repartition"] = {
                    "seconds": round(time.perf_counter() - t0, 2),
                    "files_written": _diff(idx, before),
                }
            lo, hi = (t1, t2) if n_label == 4 else (t2, mx)
            before = _files(idx)
            t0 = time.perf_counter()
            di.incremental_update(
                spark,
                docs.where((F.col("doc_id") > lo) & (F.col("doc_id") <= hi)),
                idx,
            )
            fold = {
                "seconds": round(time.perf_counter() - t0, 2),
                "files_written": _diff(idx, before),
            }
            before = _files(idx)
            t0 = time.perf_counter()
            di.remove_docs(spark, _removal_set(3 if n_label == 4 else 9), idx)
            removal = {
                "seconds": round(time.perf_counter() - t0, 2),
                "files_written": _diff(idx, before),
            }
            report[phase] = {
                "n_doc_buckets": n_label,
                "fold": fold,
                "removal": removal,
            }
        print(json.dumps(report, indent=1))
    finally:
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
