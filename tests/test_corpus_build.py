"""End-to-end corpus build: filtered doc set matches the SQL-composed
oracle, packing is deterministic, and a rerun resumes (skips complete
language partitions) with byte-identical output."""

import glob
import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from aiw_i2b2_etl_ray.pipelines.curation import SQL_CORPUS_FILTER, corpus_build

SF = "/root/testdata/sf0.001"


def _load(out):
    files = sorted(glob.glob(os.path.join(out, "*", "*.parquet")))
    t = pa.concat_tables([pq.read_table(f) for f in files])
    return t.sort_by([("pred_lang", "ascending"), ("doc_id", "ascending")])


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("corpus") / "out")
    summary = corpus_build(SF, out)
    return out, summary


def test_corpus_docs_match_filter_oracle(built):
    out, summary = built
    t = _load(out)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    expected = con.sql(SQL_CORPUS_FILTER).df()
    assert summary["docs"] == len(expected) == t.num_rows
    assert sorted(t["doc_id"].to_pylist()) == sorted(expected["doc_id"].tolist())


def test_corpus_packing_is_contiguous(built):
    out, _ = built
    t = _load(out).to_pandas()
    for lang, g in t.groupby("pred_lang"):
        g = g.sort_values("doc_id")
        cum = g["n_tokens"].cumsum()
        expect = (cum - g["n_tokens"]) // 2048
        assert (g["chunk_id"].to_numpy() == expect.to_numpy()).all(), lang


def test_corpus_rerun_resumes_and_is_identical(built, ray_session):
    out, first = built
    before = _load(out)
    summary = corpus_build(SF, out)
    assert summary["written"] == 0
    assert summary["skipped"] == first["written"]
    assert _load(out).equals(before)


def test_curation_spec_knobs(ray_session):
    """CurationSpec is the §2.10 extension surface: loosening a gate can
    only grow the surviving set; disabling dedup re-admits exactly the
    non-canonical cluster members."""
    from aiw_i2b2_etl_ray.pipelines.curation import CurationSpec, corpus_filter
    from aiw_i2b2_etl_ray.pipelines.graph_cc import dedup_clusters

    base = set(corpus_filter(SF).to_pandas()["doc_id"])
    loose = set(
        corpus_filter(SF, CurationSpec(min_alpha_ratio=0.0, min_stopword_score=0.0)).to_pandas()["doc_id"]
    )
    assert base <= loose and len(loose) > len(base)

    nodedup = set(
        corpus_filter(SF, CurationSpec(drop_duplicates=False)).to_pandas()["doc_id"]
    )
    cl = dedup_clusters(SF).to_pandas()
    dropped = set(cl.loc[cl["doc_id"] != cl["cluster_id"], "doc_id"])
    assert nodedup - base <= dropped  # re-admitted docs are exactly dup members
    assert base <= nodedup
