#!/usr/bin/env python
"""A/B: CDC-driven view maintenance vs full recompute (r11b).

The claim behind plans/acid.py::changes + plans/cdc_refresh.py: a
downstream aggregate view tracks an upstream fact table at a cost
proportional to the CHANGED data, while a full recompute grows with the
corpus. Measured here over a fold series:

* upstream: month-partitioned orders slice (sf0.1), growing by a FIXED
  ~2k-row delta batch per "day";
* per day, (a) ``refresh_agg_view`` — wall time, change-feed events
  processed, view partitions rewritten; (b) a from-scratch
  ``build_agg_view`` into a scratch table — wall time;
* plus one content-preserving full rewrite of the upstream (identical
  rows): the feed emits delete+insert for every row, all per-key deltas
  net to zero, and the refresh must rewrite ZERO view partitions.

Pass bar: refresh wall time ~flat across the series (delta is fixed)
while recompute grows with the corpus; the rewrite step touches 0
partitions. Results recorded in BASELINE.md round-11 notes.

Usage: python scripts/cdc_ab.py [--cpus 32] [--sf /root/testdata/sf0.1]
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


def _session(cpus: int):
    from dbt_jaffleshop_spark.session import get_spark

    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    return get_spark("cdc-ab")


def _frame(spark, sf: str, lo: int, hi: int):
    from dbt_jaffleshop_spark.sources import load_table

    return (
        load_table(spark, "orders", sf)
        .select(
            "o_orderkey",
            "o_custkey",
            (F.col("o_orderkey") % 97).cast("bigint").alias("val"),
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .where(
            (F.col("o_orderkey") % 100 >= lo) & (F.col("o_orderkey") % 100 < hi)
        )
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()
    spark = _session(args.cpus)

    from dbt_jaffleshop_spark.plans.acid import AcidTable
    from dbt_jaffleshop_spark.plans.cdc_refresh import (
        build_agg_view,
        refresh_agg_view,
    )

    root = tempfile.mkdtemp(prefix="cdc_ab_")
    up = AcidTable(os.path.join(root, "up"))
    view = AcidTable(os.path.join(root, "view"))
    try:
        up.append(_frame(spark, args.sf, 0, 60), partition_by=["month"])
        t0 = time.time()
        build_agg_view(spark, up, view, key="o_custkey", val="val", n_buckets=32)
        print(json.dumps({
            "step": "initial_build",
            "upstream_rows": up.read(spark).count(),
            "build_s": round(time.time() - t0, 2),
        }))

        for day, lo in enumerate(range(60, 95, 7), start=1):
            up.append(_frame(spark, args.sf, lo, lo + 7))
            v_before = view.manifest()
            t0 = time.time()
            refresh_agg_view(spark, up, view)
            refresh_s = time.time() - t0
            v_after = view.manifest()
            # match on the exact directory COMPONENT — startswith would
            # also sweep kb=10..kb=15 into kb=1's set and over-count
            by_dir = lambda m: {  # noqa: E731
                d: sorted(f for f in m["files"] if f.split("/", 1)[0] == d)
                for d in {f.split("/", 1)[0] for f in m["files"]}
            }
            da, db = by_dir(v_before), by_dir(v_after)
            rewritten = sum(1 for d in db if db[d] != da.get(d))
            scratch = AcidTable(os.path.join(root, f"scratch{day}"))
            t0 = time.time()
            build_agg_view(
                spark, up, scratch, key="o_custkey", val="val", n_buckets=32
            )
            full_s = time.time() - t0
            print(json.dumps({
                "step": f"day{day}",
                "upstream_rows": up.read(spark).count(),
                "refresh_s": round(refresh_s, 2),
                "view_partitions_rewritten": rewritten,
                "full_recompute_s": round(full_s, 2),
            }))

        # narrow delta: a batch touching ≤5 distinct keys — the regime
        # incremental maintenance exists for (a broad delta touching
        # every key honestly ties full recompute, shown above)
        keys = [
            r[0]
            for r in up.read(spark).select("o_custkey").distinct().limit(5).collect()
        ]
        narrow = (
            up.read(spark)
            .where(F.col("o_custkey").isin(keys))
            .limit(200)
            .select(
                (F.col("o_orderkey") + 10**9).alias("o_orderkey"),
                "o_custkey",
                "val",
                "month",
            )
        )
        up.append(narrow)
        v_before = view.manifest()
        t0 = time.time()
        refresh_agg_view(spark, up, view)
        refresh_s = time.time() - t0
        v_after = view.manifest()
        parts = lambda m: {  # noqa: E731
            d: sorted(f for f in m["files"] if f.split("/", 1)[0] == d)
            for d in {f.split("/", 1)[0] for f in m["files"]}
        }
        pa, pb = parts(v_before), parts(v_after)
        print(json.dumps({
            "step": "narrow_delta_5keys",
            "refresh_s": round(refresh_s, 2),
            "view_partitions_rewritten": sum(
                1 for d in pb if pb[d] != pa.get(d)
            ),
        }))

        # content-preserving rewrite: all deltas cancel, zero partitions
        pre_files = view.manifest()["files"]
        up.overwrite(up.read(spark), partition_by=["month"])
        t0 = time.time()
        refresh_agg_view(spark, up, view)
        print(json.dumps({
            "step": "unchanged_rewrite",
            "refresh_s": round(time.time() - t0, 2),
            "view_partitions_rewritten": 0
            if view.manifest()["files"] == pre_files
            else -1,
        }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
