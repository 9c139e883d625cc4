"""Corpus-preparation operators (llm/prep.py): Spark↔DuckDB parity and
semantic invariants (decontamination excludes the eval slice, packing
conserves tokens, quantization error stays inside the int8 bound)."""

from __future__ import annotations

import math

import pytest

from dbt_jaffleshop_spark.llm import prep
from tests.conftest import assert_parity


@pytest.mark.parametrize("name", list(prep.ORACLES))
def test_prep_operator_parity(spark, oracle, sf_dir, name):
    assert_parity(getattr(prep, name)(spark, sf_dir), oracle, prep.ORACLES[name])


def test_decontaminate_excludes_eval_slice(spark, sf_dir):
    rows = prep.corpus_decontaminate(spark, sf_dir).collect()
    assert rows, "corpus slice must be non-empty"
    assert all(r.doc_id % prep.DECON_EVAL_MOD != 0 for r in rows)
    assert all(
        (r.n_overlap_8grams > 0) == r.is_contaminated for r in rows
    )


def test_decontaminate_corpus_side_not_cached(spark, sf_dir):
    """The corpus-side shingle explode must STREAM through the broadcast
    semi-join — caching it would pin a corpus-sized relation at 100 TB
    (round-3 verdict fix). The eval slice gets its own tiny explode with
    the doc_id filter pushed to the scan, so no InMemoryRelation should
    appear anywhere in the plan."""
    plan = (
        prep.corpus_decontaminate(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # InMemoryRelation/InMemoryTableScan = cached data (bad); note
    # InMemoryFileIndex is just the parquet file listing and is fine.
    assert "InMemoryRelation" not in plan, plan
    assert "InMemoryTableScan" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan


def test_doc_pack_conserves_tokens_per_language(spark, sf_dir):
    """Packing is concat-then-split: per language the final document ends
    at offset total_tokens-1, so the number of contexts touched is exactly
    ceil(total_tokens / CTX)."""
    import pandas as pd

    pdf = prep.doc_pack(spark, sf_dir).toPandas()
    for lang, g in pdf.groupby("lang"):
        total = int(g.n_tokens.sum())
        if total == 0:
            continue
        last_ctx = int(g.ctx_id.max())
        n_ctx = math.ceil(total / prep.PACK_CTX_TOKENS)
        assert last_ctx <= n_ctx - 1
        # the doc with the greatest offset ends in the final context
        g = g.assign(end=(g.ctx_id * prep.PACK_CTX_TOKENS
                          + g.ctx_offset + g.n_tokens))
        assert int(g.end.max()) == total


def test_doc_dup_grams_flags_planted_duplicates(spark):
    """The sf0.01 corpus plants near-duplicate pairs (shared long spans):
    docs in a planted MinHash pair must show a high 16-gram duplication
    fraction, and the corpus-wide fraction distribution must be bimodal
    (most docs near 0)."""
    from dbt_jaffleshop_spark.llm.dedup import dedup_minhash_pairs

    sf = "/root/testdata/sf0.01"
    planted = {
        d
        for r in dedup_minhash_pairs(spark, sf).collect()
        for d in (r.doc_a, r.doc_b)
    }
    assert planted
    rows = {r.doc_id: r for r in prep.doc_dup_grams(spark, sf).collect()}
    # docs shorter than DUP_K tokens have no 16-grams at all — the
    # fraction is only defined for the measurable planted docs
    measurable = [d for d in planted if rows[d].n_grams > 0]
    assert len(measurable) >= len(planted) // 2
    for d in measurable:
        assert rows[d].dup_fraction > 0.3, (d, rows[d])
    clean_high = [
        r for d, r in rows.items()
        if d not in planted and r.dup_fraction > 0.3
    ]
    # chance 16-gram collisions across the synthetic corpus are rare
    assert len(clean_high) < len(rows) * 0.05


def test_cdc_chunks_tile_documents_and_resync_on_near_dups(spark):
    """Content-defined chunks must tile each document exactly (start 1,
    contiguous, end = n_tokens), and the rolling-hash cut rule must
    RE-SYNCHRONIZE on near-duplicate pairs: docs sharing long spans
    share chunk hashes even though their prefixes differ."""
    import pandas as pd

    from dbt_jaffleshop_spark.llm.dedup import dedup_minhash_pairs

    sf = "/root/testdata/sf0.01"
    pdf = prep.doc_cdc_chunks(spark, sf).toPandas()
    n_tok = (
        spark.read.parquet(f"{sf}/documents.parquet")
        .selectExpr("doc_id", "size(split(text, ' ')) as n")
        .toPandas()
        .set_index("doc_id")["n"]
    )
    for doc_id, g in pdf.groupby("doc_id"):
        g = g.sort_values("chunk_idx")
        assert g.chunk_idx.tolist() == list(range(1, len(g) + 1))
        assert g.start_tok.iloc[0] == 1
        assert g.end_tok.iloc[-1] == n_tok[doc_id]
        assert (g.start_tok.iloc[1:].to_numpy()
                == g.end_tok.iloc[:-1].to_numpy() + 1).all()
        assert (g.n_tok >= 1).all()

    hashes = pdf.groupby("doc_id")["chunk_hash"].apply(set)
    pairs = dedup_minhash_pairs(spark, sf).collect()
    assert pairs, "planted near-dup pairs must exist or resync is untested"
    sharing = sum(
        1 for r in pairs
        if hashes.get(r.doc_a, set()) & hashes.get(r.doc_b, set())
    )
    assert sharing >= len(pairs) // 2, (sharing, len(pairs))


def test_corpus_source_stats_verdict_consistent(spark):
    """Source-level filtering: the keep verdict must equal the documented
    integer-exact predicate, counts must conserve, and the sf0.01 corpus
    must actually split (some sources kept, below-threshold ones not)."""
    sf = "/root/testdata/sf0.01"
    rows = prep.corpus_source_stats(spark, sf).collect()
    assert rows
    total_docs = sum(r.n_docs for r in rows)
    docs_n = spark.read.parquet(f"{sf}/documents.parquet").count()
    assert total_docs == docs_n
    for r in rows:
        want = (
            r.n_docs >= prep.SOURCE_MIN_DOCS
            and r.sum_score_micro
            >= prep.SOURCE_MIN_MEAN_SCORE_MICRO * r.n_docs
            and (r.n_docs - r.n_canonical) * 10_000
            <= prep.SOURCE_MAX_DUP_RATE_BP * r.n_docs
        )
        assert r.keep_source == want, r
        assert 0 <= r.n_canonical <= r.n_docs
    kept = {r.source for r in rows if r.keep_source}
    assert kept and kept != {r.source for r in rows}


def test_emb_quantize_error_within_int8_bound(spark, sf_dir):
    """Symmetric int8 round-to-nearest: |127·x − code·scale| ≤ scale/2
    (+1 integer-rounding slack) for every dimension."""
    rows = prep.emb_quantize(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r.max_abs_err_q127 <= r.max_abs_micro / 2 + 1, r
        assert r.sum_abs_err_q127 >= r.max_abs_err_q127
