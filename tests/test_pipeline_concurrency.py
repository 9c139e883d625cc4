"""Snapshot isolation at the PIPELINE level: a full-DAG rebuild running
concurrently with readers polling every mart — each read must see a
complete committed snapshot (old or new, never partial, never an error).
Complements tests/test_streaming_sink.py's single-table reader test."""

from __future__ import annotations

import threading
import time

from dbt_jaffleshop_spark.plans.acid import AcidTable
from dbt_jaffleshop_spark.plans.dag import MODELS, run_pipeline


def test_rebuild_under_concurrent_readers(spark, sf_dir, tmp_path):
    """Build once to learn each mart's true row count, then REBUILD the
    same warehouse (full overwrite commits) while reader threads poll
    every mart. Since both builds produce identical content, any read
    observing a count != expected — or throwing — caught a torn snapshot."""
    wh = str(tmp_path / "wh")
    first = run_pipeline(spark, sf_dir, warehouse_dir=wh)
    assert all(v["status"] == "ok" for v in first.values()), first
    marts = [n for n, s in MODELS.items() if s.materialization == "table"]
    expected = {n: AcidTable(f"{wh}/{n}").read(spark).count() for n in marts}

    stop = threading.Event()
    observed: list[tuple[str, int]] = []
    errors: list[tuple[str, str]] = []

    def poll() -> None:
        while not stop.is_set():
            for name in marts:
                table = AcidTable(f"{wh}/{name}")
                try:
                    if table.exists():
                        observed.append((name, table.read(spark).count()))
                except Exception as exc:  # noqa: BLE001 — any error is a fail
                    errors.append((name, repr(exc)))
            time.sleep(0.02)

    reader = threading.Thread(target=poll)
    reader.start()
    try:
        second = run_pipeline(spark, sf_dir, warehouse_dir=wh)
    finally:
        stop.set()
        reader.join()

    assert all(v["status"] == "ok" for v in second.values()), second
    assert not errors, errors[:5]
    bad = [(n, c) for n, c in observed if c != expected[n]]
    assert not bad, f"torn snapshot reads: {bad[:5]}"
    # the poller genuinely exercised reads mid-rebuild, across marts
    assert len(observed) > len(marts), "poller never overlapped the build"
    assert {n for n, _ in observed} == set(marts)
