#!/usr/bin/env python
"""Paired same-window A/B of registry queries between two trees — the
adjudication protocol the r11/r12 verdicts and the r13 round notes ran
ad hoc (alternating passes of each tree in the same contention window,
bench forcing semantics), promoted to a script so a contended BENCH
artifact can be re-litigated reproducibly:

    git worktree add /tmp/other <commit>
    python scripts/paired_ab.py --trees /root/repo /tmp/other \
        --queries acid_digest jaffle_products --passes 2 --runs 2

Each pass runs every tree in sequence (tree order alternates per pass
so neither tree always inherits the colder cache/window), each
tree×query measurement in a FRESH interpreter (the registries of two
trees cannot share one process), with the bench protocol per run:
release_cached + noop-write forcing, one warm-up + N timed runs.
Prints one JSON line per measurement and a final summary line."""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

_CHILD = r"""
import os, sys, time
repo, name, runs, sf = sys.argv[1], sys.argv[2], int(sys.argv[3]), sys.argv[4]
sys.path.insert(0, repo)
from dbt_jaffleshop_spark.models.base import release_cached
from dbt_jaffleshop_spark.session import get_spark
import __spark_entry__ as e
spark = get_spark("paired-ab")
fn = e.queries()[name]
def once():
    release_cached(spark)
    t0 = time.perf_counter()
    fn(spark, sf).write.format("noop").mode("overwrite").save()
    return time.perf_counter() - t0
once()  # warm-up
import json as _json
print("AB_RESULT " + _json.dumps({
    "times": [round(once(), 2) for _ in range(runs)],
    "load": round(os.getloadavg()[0], 1),
}))
spark.stop()
"""


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trees", nargs="+", required=True,
                    help="repo roots to compare (e.g. HEAD checkout + a worktree)")
    ap.add_argument("--queries", nargs="+", required=True)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--sf", default=os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--timeout", type=float, default=600.0,
                    help="per-measurement child timeout in seconds — a "
                    "wedged child Spark session (the exact contended "
                    "conditions this script adjudicates) must cost one "
                    "error row, not hang the whole A/B (r13 ADVICE)")
    args = ap.parse_args()

    results: dict[str, dict[str, list]] = {
        t: {q: [] for q in args.queries} for t in args.trees
    }
    for p in range(args.passes):
        order = args.trees if p % 2 == 0 else list(reversed(args.trees))
        for tree in order:
            for q in args.queries:
                try:
                    out = subprocess.run(
                        [sys.executable, "-c", _CHILD, tree, q,
                         str(args.runs), args.sf],
                        capture_output=True, text=True,
                        timeout=args.timeout,
                    )
                except subprocess.TimeoutExpired as te:
                    print(json.dumps({
                        "tree": tree, "query": q, "pass": p + 1,
                        "error": f"timeout after {args.timeout}s",
                        "partial_output": ((te.stdout or b"").decode(
                            "utf-8", "replace")
                            if isinstance(te.stdout, bytes)
                            else te.stdout or "")[-300:],
                    }), flush=True)
                    continue
                rec = None
                for line in out.stdout.splitlines():
                    if line.startswith("AB_RESULT "):
                        rec = json.loads(line[len("AB_RESULT "):])
                if rec is None:
                    print(json.dumps({
                        "tree": tree, "query": q, "pass": p + 1,
                        "error": (out.stderr or out.stdout)[-300:],
                    }))
                    continue
                rec.update({"tree": tree, "query": q, "pass": p + 1})
                results[tree][q].append(rec)
                print(json.dumps(rec, separators=(",", ":")), flush=True)
    summary = {
        "metric": "paired_ab",
        "sf_dir": args.sf,
        "trees": {
            t: {
                q: [r["times"] for r in rs]
                for q, rs in byq.items()
            }
            for t, byq in results.items()
        },
    }
    print(json.dumps(summary, separators=(",", ":")))


if __name__ == "__main__":
    main()
