"""Surrogate-key assignment — the patient_mapping / encounter_mapping
analog (i2b2_data_tables_1_7_h2.sql:122-134, :211-225; key assignment done
by EK_INSERT_PID_MAP_FROMTEMP / EK_INSERT_EID_MAP_FROMTEMP in the
reference).  Natural string keys get dense, deterministic int64 surrogates.

Distributed global-index pattern: sort the distinct keys (the one global
order the op needs), then assign ids in two cheap phases — per-block counts
-> driver prefix-sum -> per-block offset + local arange.  No row ever
leaves its block after the sort; the prefix-sum moves one int per block.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


@ray.remote
def _block_len(t: pa.Table) -> int:
    return len(t)


@ray.remote
def _tag_block(t: pa.Table, offset: int, id_name: str) -> pa.Table:
    ids = pa.array(np.arange(offset, offset + len(t), dtype=np.int64))
    return t.append_column(id_name, ids)


def global_index(
    ds: rd.Dataset,
    sort_keys: list[str],
    *,
    id_name: str = "id",
    start: int = 1,
    descending: bool | list[bool] = False,
) -> rd.Dataset:
    """Add a dense global ``id`` column following ``sort_keys`` order.

    Phase 1: per-block lengths (one int per block to the driver).
    Phase 2: driver prefix-sum -> per-block offset.
    Phase 3: per-block local arange + offset, in parallel, zero row motion.
    """
    blocks = ds.sort(sort_keys, descending=descending).materialize().to_arrow_refs()
    counts = ray.get([_block_len.remote(b) for b in blocks])
    offsets = np.concatenate([[0], np.cumsum(counts)[:-1]]) + start
    tagged = [
        _tag_block.remote(b, int(o), id_name) for b, o in zip(blocks, offsets)
    ]
    return rd.from_arrow_refs(tagged)


def key_map(sf_dir: str) -> rd.Dataset:
    """Catalog query: dense surrogate ids for the distinct (repo, path)
    domain of the derived change stream — the encounter-mapping table."""
    from ..pipelines.cdc_queries import cdc_path_dim

    keys = cdc_path_dim(sf_dir).select_columns(["repo", "path"])
    return global_index(keys, ["repo", "path"], id_name="path_num")


SQL_KEY_MAP = None  # filled in cdc_queries to reuse the changes CTE
