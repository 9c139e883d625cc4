"""Write-audit-publish (WAP) branches over the warehouse (r11, VERDICT
r10 item 4).

Reference workflow: the jaffle-shop CI runs the whole build against a
staging environment and only promotes green runs (README.md:54-57's
"CI job … a separate CI environment"; the dbt-cloud job wrapper in
.github/workflows/scripts/dbt_cloud_run_job.py gates merges the same
way). Iceberg's ``spark.wap.branch`` and Delta/dbt blue-green deploys
are the identical pattern: WRITE new snapshots to a branch, AUDIT (run
the declarative tests) against the staged state, PUBLISH atomically
only if everything is green.

Mechanism — composes with the engine's existing commit machinery
rather than duplicating it:

* Every mart/export commit already lands as a new immutable
  :class:`..plans.acid.AcidTable` version behind an atomic per-table
  pointer. A WAP run stages through those SAME commits; what it
  withholds is VISIBILITY to branch-aware readers.
* :class:`PublishPointer` is the warehouse-level commit pointer: ONE
  JSON file mapping table → published version, swapped with
  ``os.replace`` (the same atomic-rename primitive as each table's
  ``_CURRENT``) only after every model, test, and export is green —
  the cross-table analogue of the dedup index's meta row
  (llm/dedup_incremental.py), degenerate-simple because the pipeline
  is single-writer per warehouse. MULTI-WRITER NOTE (r12, VERDICT r11
  item 6): ``os.replace`` is last-write-wins — two pipelines
  publishing the same warehouse concurrently could silently clobber
  each other's pointer. If multi-writer publishing ever lands, route
  the pointer through an ``AcidTable`` one-row ``overwrite`` with an
  unchanged-since-read validation hook (exactly the index meta-swap
  protocol), which turns the clobber into a loud
  ``ConcurrentWriteError`` for the loser. Not implemented now: the
  engine's scheduler runs one pipeline per warehouse by contract
  (plans/dag.py), so the simpler primitive is the honest one.
* ``read_mart(..., published=True)`` resolves through the pointer: a
  reader sees the PRE-run state throughout a run (snapshot isolation
  across the whole warehouse, not just per table) and the post-run
  state only after the swap — never a mix of old and new marts, which
  per-table pointers alone cannot guarantee for cross-mart joins.
* A failed audit leaves the pointer unmoved. The staged versions are
  unpublished garbage; per-model vacuum PROTECTS the published
  versions (``AcidTable.vacuum protect_versions``) so repeated failed
  runs can never reclaim the live published snapshot's files.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession

_FILE = "_PUBLISHED.json"


class PublishPointer:
    """The warehouse's atomic publish pointer (table → version)."""

    def __init__(self, warehouse_dir: str):
        self.warehouse_dir = warehouse_dir
        self.path = os.path.join(warehouse_dir, _FILE)

    def exists(self) -> bool:
        return os.path.isfile(self.path)

    def read(self) -> dict:
        with open(self.path) as f:
            return json.load(f)

    def tables(self) -> dict[str, int]:
        return self.read()["tables"] if self.exists() else {}

    def published_version(self, name: str) -> int | None:
        return self.tables().get(name)

    def publish(self, tables: dict[str, int]) -> None:
        """Atomically swap the pointer to the given versions — the
        publish step. Tables absent from ``tables`` (e.g. an export
        skipped this run but published earlier) keep their previous
        published version: a publish must never silently UNPUBLISH."""
        import datetime as _dt

        merged = {**self.tables(), **{k: int(v) for k, v in tables.items()}}
        doc = {
            "tables": merged,
            "published_at": _dt.datetime.now(_dt.timezone.utc).isoformat(),
        }
        os.makedirs(self.warehouse_dir, exist_ok=True)
        tmp = self.path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as f:
            json.dump(doc, f, indent=1)
        os.replace(tmp, self.path)  # the atomic publish point

    def read_table(
        self, spark: SparkSession, name: str
    ) -> DataFrame:
        """Read ``name`` at its PUBLISHED version (raises KeyError if
        the table was never published)."""
        from .acid import AcidTable

        v = self.published_version(name)
        if v is None:
            raise KeyError(
                f"{name!r} has no published version in {self.path} — "
                "run a publishing pipeline first or read unpublished"
            )
        return AcidTable(os.path.join(self.warehouse_dir, name)).read(
            spark, version=v
        )


def run_pipeline_wap(
    spark: SparkSession,
    sf_dir: str | None = None,
    warehouse_dir: str | None = None,
    **kwargs,
) -> tuple[dict, bool]:
    """`dbt build` with write-audit-publish: materialize + test every
    model (the WRITE and AUDIT phases — unchanged run_pipeline
    machinery), then atomically PUBLISH the new versions iff every
    model, test, contract, and export came back green. Returns
    (per-model results, published?). Branch-aware readers
    (``read_mart(..., published=True)``) see the pre-run state until
    the publish lands, and never a cross-table mix."""
    from .dag import run_pipeline

    if warehouse_dir is None:
        raise ValueError("run_pipeline_wap requires a warehouse_dir")
    pointer = PublishPointer(warehouse_dir)
    results = run_pipeline(
        spark, sf_dir, warehouse_dir=warehouse_dir, publish=pointer, **kwargs
    )
    green = all(
        r.get("status") in ("ok", "reused") for r in results.values()
    )
    if green:
        from .acid import AcidTable
        from .dag import MODELS

        staged: dict[str, int] = {}
        for name, spec in MODELS.items():
            if spec.materialization != "table":
                continue
            staged[name] = AcidTable(
                os.path.join(warehouse_dir, name)
            ).current_version()
        for key in results:
            if key.startswith("export:"):
                ename = key.removeprefix("export:")
                staged[ename] = AcidTable(
                    os.path.join(warehouse_dir, ename)
                ).current_version()
        pointer.publish(staged)
    return results, green
