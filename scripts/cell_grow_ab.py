#!/usr/bin/env python
"""A/B: ANN cell growth holds probe-time occupancy flat as the corpus
grows (r12, VERDICT r11 item 4's "done" bar — the sibling of the r11
rebucket table in BASELINE.md).

Protocol, on sf0.01 embeddings:

1. build the index at n_cells=16 over the bottom-50%-by-id slice and
   record mean candidates per 1-probe query (cell occupancy at the
   probed cells);
2. append the remaining 50% (corpus 2×) — occupancy roughly doubles,
   the exact failure mode of a frozen cell count;
3. ``grow_ann_cells`` to n_cells=64 (+1 Lloyd round) — occupancy falls
   back to ~the 1× level (or below), with search results still exact
   for the stored quantizer (pytest pins grow ≡ from-scratch).

Pass bar: step-3 occupancy ≤ step-1 occupancy × ~1.3 while the corpus
stayed 2×. Results recorded in BASELINE.md round-12 notes.

Usage: python scripts/cell_grow_ab.py [--cpus 32] [--sf /root/testdata/sf0.01]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    args = ap.parse_args()
    os.environ["SPARK_GRAFT_CPUS"] = str(args.cpus)

    from dbt_jaffleshop_spark.llm import ann_index as ai
    from dbt_jaffleshop_spark.llm.dedup import _quantize_frame
    from dbt_jaffleshop_spark.llm.similarity import QUERY_STRIDE
    from dbt_jaffleshop_spark.session import get_spark
    from dbt_jaffleshop_spark.sources import load_table

    spark = get_spark("cell-grow-ab")
    emb = load_table(spark, "embeddings", args.sf).select(
        "vec_id", "embedding"
    )
    mx = int(emb.agg(F.max("vec_id")).collect()[0][0])
    half = mx // 2
    queries = _quantize_frame(
        emb.where(F.col("vec_id") % QUERY_STRIDE == 0)
    ).localCheckpoint()

    root = tempfile.mkdtemp(prefix="cell_grow_ab_")
    report: dict = {"sf_dir": args.sf, "n_vectors_total": emb.count()}
    try:
        idx = ai.build_ann_index(
            spark, emb.where(F.col("vec_id") <= half), root,
            train_iters=1, n_cells=16,
        )

        def occupancy() -> dict:
            # the measurement now lives in the library (r12 verdict
            # item 3): this A/B and production operators read the SAME
            # signal, and tests/test_layout_report.py pins the
            # trajectory this script measured
            rep = ai.layout_report(spark, idx, queries=queries)
            return {
                k: rep[k]
                for k in (
                    "n_cells",
                    "corpus",
                    "mean_candidates_per_probe",
                    "max_candidates_per_probe",
                )
            }

        report["build_1x_n16"] = occupancy()
        ai.append_vectors(spark, emb.where(F.col("vec_id") > half), idx)
        report["append_2x_n16"] = occupancy()
        t0 = time.perf_counter()
        ai.grow_ann_cells(spark, idx, 64, train_iters=1)
        report["grow_seconds"] = round(time.perf_counter() - t0, 2)
        report["grown_2x_n64"] = occupancy()
        print(json.dumps(report, indent=1))
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
