#!/usr/bin/env python
"""A/B: the embedding-index occupancy knob (r11, VERDICT r10 item 2's
"done" bar: per-delta candidate work stays ~flat across a rebucket).

The fold's per-delta cost is its buckets' corpus occupancy — corpus/16
per band at the fixed 4-bit banding — so a 10× corpus means ~10× the
candidate pairs per delta vector. Production holds that constant by
scaling bucket count with the corpus; ``rebucket_emb_index`` is that
knob (each extra bit doubles the bucket count).

Measured here, per configuration: candidate pairs a fold of a FIXED
delta generates (the (corpus×delta ∪ delta×delta) shared-bucket join,
exactly the fold's `cands`), normalized per delta vector:

* 1× corpus (sf0.01 embeddings), extra_bits=0  — the baseline;
* 10× corpus (sf0.1 embeddings), extra_bits=0  — occupancy blows up;
* 10× corpus, rebucketed extra_bits=3          — 8× more buckets,
  candidates back near the 1× baseline.

Pass bar: cands_per_delta(10×, bits=3) ≈ cands_per_delta(1×, bits=0),
while cands_per_delta(10×, bits=0) is ~10× the baseline. Results in
BASELINE.md round-11 notes.

Usage: python scripts/rebucket_ab.py [--cpus 32]
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
    return get_spark("rebucket-ab")


def run_config(spark, sf_dir: str, extra_bits: int, delta_n: int) -> dict:
    from dbt_jaffleshop_spark.llm import dedup_incremental as di
    from dbt_jaffleshop_spark.llm.dedup import _quantize_frame
    from dbt_jaffleshop_spark.sources import load_table

    emb = load_table(spark, "embeddings", sf_dir).select("vec_id", "embedding")
    ids = sorted(r[0] for r in emb.select("vec_id").collect())
    delta_ids = set(ids[-delta_n:])
    corpus = emb.where(~F.col("vec_id").isin(list(delta_ids)))
    delta = emb.where(F.col("vec_id").isin(list(delta_ids)))

    root = tempfile.mkdtemp(prefix="rebucket_ab_")
    try:
        idx = di.build_emb_index(spark, corpus, root)
        if extra_bits:
            di.rebucket_emb_index(spark, idx, extra_bits=extra_bits)
        _v, snap = idx.snapshot(spark)
        bits = int(snap.get("extra_bits", 0) or 0)
        # the fold's candidate relation, verbatim (emb_incremental_update)
        dq = _quantize_frame(delta)
        d_buckets = di._coarse_buckets(dq, bits)
        stored = idx.buckets.read(spark, version=snap["buckets_v"]).select(
            "vec_id", "band", "bk"
        )
        cross = (
            stored.alias("c")
            .join(d_buckets.alias("d"), ["band", "bk"])
            .select(
                F.col("c.vec_id").alias("id_a"), F.col("d.vec_id").alias("id_b")
            )
        )
        dd = (
            d_buckets.alias("a")
            .join(d_buckets.alias("b"), ["band", "bk"])
            .where(F.col("a.vec_id") < F.col("b.vec_id"))
            .select(
                F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b")
            )
        )
        t0 = time.perf_counter()
        n_cands = cross.unionByName(dd).distinct().count()
        secs = time.perf_counter() - t0
        return {
            "sf_dir": sf_dir,
            "extra_bits": bits,
            "corpus_n": len(ids) - len(delta_ids),
            "delta_n": len(delta_ids),
            "candidates": n_cands,
            "cands_per_delta": round(n_cands / max(1, len(delta_ids)), 1),
            "cand_join_seconds": round(secs, 2),
        }
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--delta-n", type=int, default=50)
    args = ap.parse_args()
    spark = _session(args.cpus)
    for sf_dir, bits in (
        ("/root/testdata/sf0.01", 0),
        ("/root/testdata/sf0.1", 0),
        ("/root/testdata/sf0.1", 3),
    ):
        print(json.dumps(run_config(spark, sf_dir, bits, args.delta_n)), flush=True)


if __name__ == "__main__":
    main()
