"""Subprocess drives of the newer CLI verbs (each owns its Ray session):
`windows` (exactly-once fold + idempotent refold) and `corpus`
(build + resumed rerun)."""

import json
import os
import subprocess
import sys

import pytest


def _run(args, timeout=300):
    env = dict(os.environ, RAY_ADDRESS="local")
    r = subprocess.run(
        [sys.executable, "-m", "aiw_i2b2_etl_ray", *args],
        capture_output=True,
        text=True,
        cwd="/root/repo",
        env=env,
        timeout=timeout,
    )
    return r


@pytest.fixture(scope="module")
def changes_dir(tmp_path_factory):
    from aiw_i2b2_etl_ray.sources.synth import generate_changes

    d = str(tmp_path_factory.mktemp("cli_changes"))
    generate_changes(d, 800, n_repos=2, paths_per_repo=15, seed=21, rows_per_file=400)
    return d


def test_windows_cli_fold_refold_and_pin(changes_dir, tmp_path):
    out = str(tmp_path / "win")
    r1 = _run(["windows", "--input", changes_dir, "--out", out, "--num-partitions", "4"])
    assert r1.returncode == 0, r1.stderr[-2000:]
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["rows_folded"] > 0 and s1["rows_skipped"] == 0

    r2 = _run(["windows", "--input", changes_dir, "--out", out, "--num-partitions", "4"])
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["rows_folded"] == 0 and s2["rows_skipped"] > 0  # exactly-once

    r3 = _run(["windows", "--input", changes_dir, "--out", out, "--num-partitions", "8"])
    assert r3.returncode != 0
    assert "refusing to fold" in (r3.stderr + r3.stdout)


def test_corpus_cli_build_and_resume(tmp_path):
    out = str(tmp_path / "corpus")
    r1 = _run(["corpus", "--sf-dir", "/root/testdata/sf0.001", "--out", out], timeout=420)
    assert r1.returncode == 0, r1.stderr[-2000:]
    s1 = json.loads(r1.stdout.strip().splitlines()[-1])
    assert s1["written"] > 0 and s1["docs"] > 0

    r2 = _run(["corpus", "--sf-dir", "/root/testdata/sf0.001", "--out", out], timeout=420)
    s2 = json.loads(r2.stdout.strip().splitlines()[-1])
    assert s2["written"] == 0 and s2["skipped"] == s1["written"]
