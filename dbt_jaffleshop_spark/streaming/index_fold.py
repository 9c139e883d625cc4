"""Streaming → incremental-dedup-index fold (r11, beyond-reference):
the continuous form of the daily ingestion pipeline — document batches
arrive as files, and every micro-batch folds into the persisted MinHash
index (llm/dedup_incremental.py) through its atomic meta transaction,
so a reader of the index always sees a consistent build ∪ complete
prefix of folds, never a torn batch.

Exactly-once WITHOUT a separate transaction ledger: the index's id
HIGH-WATER MARK is the streaming progress marker. Batch ids are
monotone by the fold's own id-ordering invariant, so after a restart:

* a replayed batch whose max doc_id ≤ the committed high-water mark
  was already folded (its meta swap landed) — skipped;
* a batch interrupted MID-fold left meta unmoved (the transaction's
  crash guarantee), so its ids sit above the mark and the replay
  re-folds it; pinned-base commits make the re-run idempotent (the
  crashed attempt's partial versions are unreferenced garbage);
* a batch STRADDLING the mark can only mean the feed violated id
  monotonicity — refused loudly rather than silently double-counting.

This is the same ``txnVersion`` idempotence trick as the events ACID
sink (streaming/sink.py), with the mark the index already maintains
standing in for the batch-id column. The first non-empty batch builds
the index; every later one is a delta fold — at 100 TB this is the
shape of continuous corpus dedup: the stream pays O(|batch|) per
trigger and the index never recomputes a corpus signature.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..llm.dedup_incremental import (
    DedupIndex,
    build_dedup_index,
    incremental_update,
)


def streaming_vectors_append(
    spark: SparkSession,
    source_dir: str,
    index_root: str,
    train_iters: int = 1,
    max_files_per_trigger: int | None = None,
    n_cells: int | None = None,
):
    """The ANN-index twin of :func:`streaming_documents_fold`:
    embedding batches arriving as files append into the persisted IVF
    index (llm/ann_index.py) — first non-empty batch builds (training
    the coarse quantizer), later ones assign against the stored
    centroids and append O(|batch|). Exactly-once via the same
    id-high-water-mark marker; periodic ``retrain_ann_index`` /
    ``grow_ann_cells`` runs between streams are invisible to this sink
    (the mark is training- and layout-independent; appends read the
    committed cell count from meta). ``n_cells`` sets the seed-cell
    count IF this sink performs the initial build (r12 — ignored when
    the index already exists, where the committed layout governs)."""
    from ..llm.ann_index import (
        N_CELLS,
        AnnIndex,
        append_vectors,
        build_ann_index,
    )

    if n_cells is None:
        n_cells = N_CELLS
    idx = AnnIndex(index_root)
    reader = spark.readStream.schema("vec_id bigint, embedding array<float>")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def append_batch(batch_df, batch_id: int) -> None:
        batch = batch_df.select("vec_id", "embedding")
        if batch.isEmpty():
            return
        if not idx.exists():
            build_ann_index(
                spark, batch, index_root, train_iters=train_iters,
                n_cells=n_cells,
            )
            return
        hwm = idx.max_vec_id(spark)
        lo, hi = batch.agg(
            F.min("vec_id").alias("lo"), F.max("vec_id").alias("hi")
        ).collect()[0][:2]
        if int(hi) <= hwm:
            return  # replay — already appended
        if int(lo) <= hwm:
            raise ValueError(
                f"streaming_vectors_append: batch {batch_id} straddles the "
                f"index high-water mark {hwm} (ids {lo}..{hi}) — the feed "
                "must deliver monotone vec_ids per batch"
            )
        append_vectors(spark, batch, idx)

    q = (
        stream.writeStream.foreachBatch(append_batch)
        .option("checkpointLocation", index_root + "/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return idx


def streaming_documents_fold(
    spark: SparkSession,
    source_dir: str,
    index_root: str,
    max_files_per_trigger: int | None = None,
    n_doc_buckets: int | None = None,
) -> DedupIndex:
    """Run the document feed to completion (availableNow) into the
    dedup index at ``index_root``; returns the index. Restart-safe on
    the same checkpoint (see module docstring); pass
    ``max_files_per_trigger`` to exercise the per-batch fold path.
    ``n_doc_buckets`` sets the hash-partition layout IF this sink
    performs the initial build (r12 — ignored when the index already
    exists: every fold derives buckets from the committed meta, so a
    ``repartition_index`` between streams is invisible here)."""
    from ..llm.dedup_incremental import N_DOC_BUCKETS

    if n_doc_buckets is None:
        n_doc_buckets = N_DOC_BUCKETS
    idx = DedupIndex(index_root)
    reader = spark.readStream.schema("doc_id bigint, text string")
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    def fold_batch(batch_df, batch_id: int) -> None:
        batch = batch_df.select("doc_id", "text")
        if batch.isEmpty():
            return  # restart tail / empty trigger
        if not idx.exists():
            # first batch = the one full build; a crash between the
            # build's data commits and its meta swap leaves meta absent,
            # so the replay simply rebuilds (overwrites) — idempotent
            build_dedup_index(
                spark, batch, index_root, n_doc_buckets=n_doc_buckets
            )
            return
        hwm = idx.max_doc_id(spark)
        lo, hi = batch.agg(
            F.min("doc_id").alias("lo"), F.max("doc_id").alias("hi")
        ).collect()[0][:2]
        if int(hi) <= hwm:
            return  # replayed batch — its meta swap already landed
        if int(lo) <= hwm:
            raise ValueError(
                f"streaming_documents_fold: batch {batch_id} straddles the "
                f"index high-water mark {hwm} (ids {lo}..{hi}) — the feed "
                "must deliver monotone doc_ids per batch; a straddle means "
                "out-of-order delivery, not a replay, and folding it would "
                "violate the index's id-ordering invariant"
            )
        incremental_update(spark, batch, idx)

    q = (
        stream.writeStream.foreachBatch(fold_batch)
        .option("checkpointLocation", index_root + "/_checkpoint")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return idx
