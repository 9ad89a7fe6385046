"""Persistent, incrementally-merged ontology — the reference's
``alreadyLoaded`` reconciliation: newly discovered concepts are folded
into an ontology that previous runs already materialized, rather than
recomputed from scratch (dest/metadata/Metadata.java:424-513
``setI2B2PathsToConcepts`` walks the already-loaded folder set and only
creates what is new; ksb/I2b2KnowledgeSourceBackend's metadata table is
the durable artifact).

Design: the persisted table IS the state.  An update run

1. discovers the input's (lang, source) concept pairs with the same
   distributed combiner-partial scan the one-shot query uses (the only
   data-sized step — full rows never leave their block),
2. recovers the already-loaded pair set from the persisted table's leaf
   rows (``c_fullname`` encodes the pair, so no sidecar state can drift
   from the table),
3. rebuilds the tree from the UNION of pair sets via the shared pure
   builder (``ontology.build_tree``) and atomically swaps the table in.

Merge semantics this gives for free, matching the reference:
* last-writer-wins on ``c_fullname`` — a leaf whose source gained a new
  lang gets its ``c_metadataxml`` value-set regenerated (the enum grows),
* synonym flags preserved/recomputed deterministically from the global
  first-occurrence order, never duplicated,
* convergence — any partition of the corpus into update runs, in any
  order, ends byte-identical to the one-shot build over the whole corpus
  (the builder is a pure function of the merged pair set), which is the
  property the reference's reconciliation exists to protect.

The metadata table is small by construction (one row per distinct
concept), like the reference's in-memory tree; only discovery scales
with data.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ..stages.merge import _atomic_write
from .ontology import build_tree, _distinct_pairs

ONTO_REL_PATH = os.path.join("metadata", "ontology.parquet")


def _onto_file(out_dir: str) -> str:
    return os.path.join(out_dir, ONTO_REL_PATH)


def load_ontology(out_dir: str) -> pa.Table | None:
    """The persisted metadata table, or None before the first run."""
    f = _onto_file(out_dir)
    return pq.read_table(f) if os.path.exists(f) else None


def pairs_from_table(t: pa.Table) -> set[tuple[str, str]]:
    """Recover the loaded (lang, source) pair set from the leaf rows —
    ``\\Lang\\{lang}\\{source}\\`` is injective, so the table itself is the
    complete already-loaded state (no sidecar to go stale)."""
    leaves = t.filter(pc.equal(t["c_hlevel"], 2))
    out: set[tuple[str, str]] = set()
    for fn in leaves["c_fullname"].to_pylist():
        _root, lang, source = fn.strip("\\").split("\\", 2)
        out.add((lang, source))
    return out


def update_ontology(sf_dir: str, out_dir: str, row_filter=None) -> dict:
    """Fold the input corpus's concepts into the persisted ontology.
    Idempotent (re-running with the same input is a no-op) and
    commutative across runs (any run order converges).  ``row_filter``
    (pyarrow dataset expression) bounds discovery to a corpus slice —
    the incremental-tail case."""
    discovered = set(_distinct_pairs(sf_dir, row_filter=row_filter))
    prior_table = load_ontology(out_dir)
    prior = pairs_from_table(prior_table) if prior_table is not None else set()
    merged = prior | discovered
    table = build_tree(sorted(merged))
    os.makedirs(os.path.dirname(_onto_file(out_dir)), exist_ok=True)
    _atomic_write(table, _onto_file(out_dir))
    return {
        "concepts_prior": len(prior),
        "concepts_discovered": len(discovered),
        "concepts_new": len(merged) - len(prior),
        "rows": len(table),
    }


def ontology_persisted(sf_dir: str) -> pa.Table:
    """Catalog surface for the persistent store: a genuine two-run
    incremental build — run 1 discovers from a bounded doc_id prefix of
    the corpus, run 2 from the full corpus — whose persisted result must land
    byte-identical on the one-shot table (oracle: the same
    SQL_ONTOLOGY_TABLE the one-shot query checks against, because
    convergence IS the reconciliation contract, Metadata.java:424-513)."""
    import shutil
    import tempfile

    import pyarrow.dataset as pads

    out = tempfile.mkdtemp(prefix="aiw-onto-store-")
    try:
        update_ontology(sf_dir, out, row_filter=(pads.field("doc_id") < 100))
        update_ontology(sf_dir, out)
        return load_ontology(out)
    finally:
        shutil.rmtree(out, ignore_errors=True)
