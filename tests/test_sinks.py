"""Resumable partitioned sink: atomic per-key files, rerun skips complete
keys, crash-mid-key (no data-000) triggers a full-key rewrite."""

import glob
import os

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data as rd

from aiw_i2b2_etl_ray.sinks import write_partitioned

SF = "/root/testdata/sf0.001"


def _load_all(out):
    files = sorted(glob.glob(os.path.join(out, "*", "*.parquet")))
    return pa.concat_tables([pq.read_table(f) for f in files])


def test_partitioned_write_roundtrip_and_skip(tmp_path, ray_session):
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
    out = str(tmp_path / "docs_by_lang")
    s1 = write_partitioned(ds, out, by="lang")
    assert s1["written"] > 0 and s1["skipped"] == 0
    whole = _load_all(out)
    assert whole.num_rows == ds.count()
    assert len(glob.glob(os.path.join(out, "lang=*"))) == s1["written"]

    # rerun: everything already complete -> all skipped, files untouched
    mtimes = {f: os.path.getmtime(f) for f in glob.glob(os.path.join(out, "*", "*"))}
    s2 = write_partitioned(ds, out, by="lang")
    assert s2 == {"written": 0, "skipped": s1["written"]}
    assert mtimes == {f: os.path.getmtime(f) for f in glob.glob(os.path.join(out, "*", "*"))}


def test_partitioned_write_crash_recovery(tmp_path, ray_session):
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
    out = str(tmp_path / "recov")
    write_partitioned(ds, out, by="lang", max_rows_per_file=30)
    keydir = sorted(glob.glob(os.path.join(out, "lang=*")))[0]
    n_files = len(glob.glob(os.path.join(keydir, "*.parquet")))
    assert n_files > 1  # chunking happened
    # simulate a crash mid-key: completion marker (data-000) missing
    os.remove(os.path.join(keydir, "data-000.parquet"))
    s = write_partitioned(ds, out, by="lang", max_rows_per_file=30)
    assert s["written"] == 1  # only the damaged key rewritten
    assert len(glob.glob(os.path.join(keydir, "*.parquet"))) == n_files
    assert _load_all(out).num_rows == ds.count()


def test_crash_rerun_with_fewer_chunks_clears_stale_files(tmp_path, ray_session):
    """A crashed attempt's higher-numbered chunks must not survive a rerun
    that produces fewer chunks (e.g. a larger max_rows_per_file): stale
    data-NNN files read alongside fresh ones would corrupt the partition."""
    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
    out = str(tmp_path / "stale")
    write_partitioned(ds, out, by="lang", max_rows_per_file=30)
    keydir = sorted(glob.glob(os.path.join(out, "lang=*")))[0]
    assert len(glob.glob(os.path.join(keydir, "*.parquet"))) > 1
    # crash: marker missing, higher-numbered chunks + a tmp left behind
    os.remove(os.path.join(keydir, "data-000.parquet"))
    with open(os.path.join(keydir, "data-099.parquet.tmp"), "wb"):
        pass
    # rerun writes ONE chunk per key (no max_rows_per_file)
    s = write_partitioned(ds, out, by="lang")
    assert s["written"] == 1
    left = sorted(os.path.basename(f) for f in glob.glob(os.path.join(keydir, "data-*")))
    assert left == ["data-000.parquet"], left
    assert _load_all(out).num_rows == ds.count()
