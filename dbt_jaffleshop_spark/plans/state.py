"""State-aware rebuild skip — the engine analogue of dbt's state
selection (`state:modified` / `--defer`; reference README.md:170-176
describes the state-aware dev workflow built on it).

Each model gets a **fingerprint**: sha256 over its own code (builder
function source), its materialization config (contract, partitioning,
watermark, attached test names), its dependencies' fingerprints
(transitively — an upstream edit changes every descendant's
fingerprint), and, for root models, the identity of the source parquet
files (name, size, mtime). A mart commit records the fingerprint in its
snapshot manifest (plans/acid.py `meta`); a state-aware pipeline run
skips re-materializing any mart whose stored fingerprint equals the
current one and re-reads the existing snapshot instead — so a no-change
rebuild writes nothing, and an edit rebuilds exactly its subtree.

Scope note: hashing uses the builder FUNCTION's source, not its module,
so an edit to a sibling model in the same file doesn't invalidate this
one. Helper-function edits are not detected — the dbt analogue is
macro changes, which dbt's state method also tracks only at the
manifest level; `run_pipeline(state_aware=False)` (the default) always
rebuilds.
"""

from __future__ import annotations

import glob
import hashlib
import inspect
import os


def model_fingerprint(
    models: dict, name: str, sf_dir: str | None,
    _memo: dict[str, str] | None = None,
) -> str:
    """Fingerprint of `name` in the given MODELS registry (passed in so
    monkeypatched registries fingerprint what will actually run)."""
    if _memo is None:
        _memo = {}
    if name in _memo:
        return _memo[name]
    spec = models[name]
    h = hashlib.sha256()
    h.update(inspect.getsource(spec.builder).encode())
    h.update(repr(sorted(spec.partition_expr.items())).encode())
    h.update(repr(spec.partition_by).encode())
    h.update(repr(spec.watermark_col).encode())
    h.update(repr(spec.contract).encode())
    h.update(repr([t[0] for t in spec.tests]).encode())
    for d in spec.depends_on:
        h.update(model_fingerprint(models, d, sf_dir, _memo).encode())
    if not spec.depends_on and sf_dir:
        # root model: bind to the source data's identity so a refreshed
        # input invalidates the whole affected subtree
        for f in sorted(glob.glob(os.path.join(sf_dir, "*.parquet"))):
            st = os.stat(f)
            h.update(
                f"{os.path.basename(f)}:{st.st_size}:{st.st_mtime_ns}".encode()
            )
    _memo[name] = h.hexdigest()
    return _memo[name]


def export_fingerprint(models: dict, export_spec, query, sf_dir: str | None) -> str:
    """Fingerprint of a saved-query export: the upstream mart's
    fingerprint + the compiled query's own configuration."""
    h = hashlib.sha256()
    h.update(model_fingerprint(models, export_spec.depends_on, sf_dir).encode())
    h.update(
        repr(
            (
                export_spec.saved_query,
                query.metrics,
                query.group_by,
                query.where,
            )
        ).encode()
    )
    return h.hexdigest()
