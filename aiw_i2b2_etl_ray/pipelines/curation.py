"""End-to-end corpus curation: the composition a pre-training data
pipeline actually ships — quality gate ∧ language gate ∧ keep-one-per-
duplicate-cluster — built by CHAINING catalog operators (text_quality,
text_langid, dedup_clusters) as Datasets, not by re-implementing them.

Physical shape: the two per-doc scorers are independent parallel maps
joined once on doc_id (bucketed co-shuffle); the duplicate drop-set is
tiny (non-canonical members of near-dup clusters) and broadcasts via
``ray.put`` into a vectorized filter — no third shuffle.  At 100 TB the
drop-set broadcast becomes a bloom filter, same plan.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..stages.join import bucketed_join
from ..util import worker_runtime_env

MIN_ALPHA_RATIO = 0.82
MIN_STOPWORD_SCORE = 0.02


from dataclasses import dataclass


@dataclass(frozen=True)
class CurationSpec:
    """User-extension surface for the training-data pipeline — the
    curation analog of ``config.ReplaySpec`` (SURVEY §2.10: job specs are
    plain dataclasses, not a service registry).  Every knob the curation
    chain hard-codes by default is overridable per job."""

    min_alpha_ratio: float = MIN_ALPHA_RATIO
    min_stopword_score: float = MIN_STOPWORD_SCORE
    drop_duplicates: bool = True  # keep-one-per-near-dup-cluster
    pack_capacity: int = 2048  # tokens per packed context window


def corpus_filter(sf_dir: str, spec: CurationSpec = CurationSpec()) -> rd.Dataset:
    """doc ids that survive curation, with the signals that admitted them."""
    from .graph_cc import dedup_clusters
    from .textops import text_langid, text_quality

    # The two scorer stages are actor pools; MATERIALIZE their (small,
    # post-filter) outputs before the join so the pools finish and release
    # their CPUs before the join's sort runs.  Leaving all of it in one
    # lazy graph intermittently livelocks on small CPU counts: the sort's
    # boundary-sample tasks wait on CPUs the autoscaling actor pools are
    # squatting (observed as a 5-min+ hang under the 4-CPU test session).
    quality = (
        text_quality(sf_dir)
        .map_batches(
            lambda t: t.filter(pc.greater_equal(t["alpha_ratio"], spec.min_alpha_ratio)),
            batch_format="pyarrow",
        )
        .select_columns(["doc_id", "alpha_ratio"])
        .materialize()
    )

    lang = (
        text_langid(sf_dir)
        .map_batches(
            lambda t: t.filter(
                pc.and_(
                    pc.not_equal(t["pred_lang"], "und"),
                    pc.greater_equal(t["stopword_score"], spec.min_stopword_score),
                )
            ),
            batch_format="pyarrow",
        )
        .select_columns(["doc_id", "pred_lang"])
        .materialize()
    )

    if spec.drop_duplicates:
        # non-canonical members of duplicate clusters (tiny: only docs in pairs)
        clusters = dedup_clusters(sf_dir).to_pandas()
        drop = set(
            clusters.loc[clusters["doc_id"] != clusters["cluster_id"], "doc_id"].tolist()
        )
    else:
        drop = set()
    drop_ref = ray.put(np.array(sorted(drop), dtype=np.int64))

    joined = bucketed_join(quality, lang, on=["doc_id"], num_buckets=8)

    def drop_dups(t: pa.Table) -> pa.Table:
        dropped = ray.get(drop_ref)
        ids = t["doc_id"].to_numpy()
        keep = ~np.isin(ids, dropped)
        return t.filter(pa.array(keep))

    return joined.map_batches(drop_dups, batch_format="pyarrow", **worker_runtime_env())


def _sql() -> str:
    from .graph_cc import SQL_DEDUP_CLUSTERS
    from .textops import SQL_TEXT_LANGID, SQL_TEXT_QUALITY

    return f"""
WITH q AS ({SQL_TEXT_QUALITY}),
l AS ({SQL_TEXT_LANGID}),
c AS ({SQL_DEDUP_CLUSTERS})
SELECT q.doc_id, q.alpha_ratio, l.pred_lang
FROM q
JOIN l ON l.doc_id = q.doc_id
WHERE q.alpha_ratio >= {MIN_ALPHA_RATIO}
  AND l.pred_lang <> 'und'
  AND l.stopword_score >= {MIN_STOPWORD_SCORE}
  AND q.doc_id NOT IN (SELECT doc_id FROM c WHERE doc_id <> cluster_id)
"""


SQL_CORPUS_FILTER = _sql()


def corpus_build(
    sf_dir: str, out_dir: str, *, spec: CurationSpec = CurationSpec(), capacity: int | None = None
) -> dict:
    """The second flagship: end-to-end training-corpus build.

        documents --corpus_filter--> surviving docs
                  --join n_chars----> token counts
                  --per-lang pack---> context-window assignment
                  --write_partitioned(by=lang)--> resumable parquet layout

    Returns {"written": ..., "skipped": ..., "docs": n}.  Rerunning after
    a partial failure skips completed language partitions (sinks.py
    contract); the whole build is deterministic, so a resumed run
    produces byte-identical output."""
    import numpy as np
    import pandas as pd

    from ..sinks import write_partitioned

    cap = capacity if capacity is not None else spec.pack_capacity
    kept = corpus_filter(sf_dir, spec)

    # fetch n_chars for surviving docs: broadcast the (tiny) kept-id set
    # is wrong at 100 TB — instead co-shuffle docs + kept ids once
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    enriched = bucketed_join(
        kept.select_columns(["doc_id", "pred_lang"]), docs, on=["doc_id"], num_buckets=8
    )

    def pack(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="mergesort")
        toks = (g["n_chars"].to_numpy() // 4).astype(np.int64)
        cum = np.cumsum(toks)
        g = g.reset_index(drop=True)
        g["n_tokens"] = toks
        g["chunk_id"] = ((cum - toks) // cap).astype(np.int64)
        return g[["doc_id", "pred_lang", "n_tokens", "chunk_id"]]

    # materialize once: both the count and the sink consume the same blocks
    packed = (
        enriched.groupby("pred_lang").map_groups(pack, batch_format="pandas").materialize()
    )
    summary = write_partitioned(packed, out_dir, by="pred_lang")
    summary["docs"] = packed.count()
    return summary
