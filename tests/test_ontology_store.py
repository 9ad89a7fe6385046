"""Persistent, incrementally-merged ontology (the reference's
alreadyLoaded reconciliation, dest/metadata/Metadata.java:424-513):
update runs fold newly discovered concepts into the persisted metadata
table and converge byte-identically to the one-shot build."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from aiw_i2b2_etl_ray.pipelines.ontology import ontology_table
from aiw_i2b2_etl_ray.pipelines.ontology_store import (
    load_ontology,
    pairs_from_table,
    update_ontology,
)

SF_DIR = "/root/testdata/sf0.001"


def _docs(pairs, start_id=0):
    n = len(pairs)
    return pa.table(
        {
            "doc_id": pa.array(range(start_id, start_id + n), pa.int64()),
            "text": pa.array([f"doc {i}" for i in range(n)], pa.string()),
            "lang": pa.array([p[0] for p in pairs], pa.string()),
            "source": pa.array([p[1] for p in pairs], pa.string()),
            "n_chars": pa.array([5] * n, pa.int64()),
        }
    )


def _write_docs(d, pairs, start_id=0):
    os.makedirs(d, exist_ok=True)
    pq.write_table(_docs(pairs, start_id), os.path.join(d, "documents.parquet"))
    return d


def test_two_run_merge_converges_to_one_shot(tmp_path):
    """Run 1 loads half the corpus, run 2 the rest (new langs AND new
    sources for known langs): the persisted table equals the one-shot
    build over the full corpus byte-identically."""
    all_pairs = [
        ("en", "web"),
        ("en", "wiki"),
        ("de", "web"),
        ("de", "news"),
        ("fr", "wiki"),
    ]
    r1 = _write_docs(str(tmp_path / "r1"), all_pairs[:2])
    r2 = _write_docs(str(tmp_path / "r2"), all_pairs[2:], start_id=100)
    full = _write_docs(str(tmp_path / "full"), all_pairs)
    out = str(tmp_path / "wh")

    s1 = update_ontology(r1, out)
    assert s1["concepts_prior"] == 0 and s1["concepts_new"] == 2
    s2 = update_ontology(r2, out)
    assert s2["concepts_prior"] == 2 and s2["concepts_new"] == 3

    merged = load_ontology(out)
    one_shot = ontology_table(full)
    assert merged.equals(one_shot), "incremental merge diverged from one-shot"


def test_update_is_idempotent_and_lww_on_fullname(tmp_path):
    """Re-running the same input is a no-op; a source gaining a new lang
    regenerates the leaf's value-set XML (LWW on c_fullname) and flags
    the later-lang occurrence as synonym."""
    out = str(tmp_path / "wh")
    r1 = _write_docs(str(tmp_path / "r1"), [("en", "web")])
    update_ontology(r1, out)
    before = load_ontology(out)
    s = update_ontology(r1, out)  # identical redelivery
    assert s["concepts_new"] == 0
    assert load_ontology(out).equals(before)

    # 'web' gains lang 'de': both leaves' enum xml now lists [de, en]
    r2 = _write_docs(str(tmp_path / "r2"), [("de", "web")], start_id=10)
    update_ontology(r2, out)
    t = load_ontology(out)
    leaves = {
        fn: xml
        for fn, xml in zip(
            t["c_fullname"].to_pylist(), t["c_metadataxml"].to_pylist()
        )
        if xml is not None
    }
    for fn in ("\\Lang\\en\\web\\", "\\Lang\\de\\web\\"):
        assert "<Val description=\"\">de</Val><Val description=\"\">en</Val>" in leaves[fn]
    syn = dict(zip(t["c_fullname"].to_pylist(), t["c_synonym_cd"].to_pylist()))
    assert syn["\\Lang\\de\\web\\"] == "N"  # first in sorted order
    assert syn["\\Lang\\en\\web\\"] == "Y"  # duplicate concept id -> synonym


def test_run_order_commutes(tmp_path):
    """Any replay order of the same update slices converges (the
    reconciliation is a pure function of the merged pair set)."""
    a = _write_docs(str(tmp_path / "a"), [("en", "web"), ("fr", "wiki")])
    b = _write_docs(str(tmp_path / "b"), [("de", "web")], start_id=50)
    out_ab, out_ba = str(tmp_path / "ab"), str(tmp_path / "ba")
    update_ontology(a, out_ab), update_ontology(b, out_ab)
    update_ontology(b, out_ba), update_ontology(a, out_ba)
    assert load_ontology(out_ab).equals(load_ontology(out_ba))


def test_pairs_roundtrip_through_table():
    t = ontology_table(SF_DIR)
    from aiw_i2b2_etl_ray.pipelines.ontology import _distinct_pairs

    assert pairs_from_table(t) == set(_distinct_pairs(SF_DIR))
