"""Accuracy and mergeability contracts for the sketch aggregates.

The HLL has no SQL oracle (hash-defined); these tests ARE its correctness
gate: bounded relative error vs the exact distinct count, and register-fold
associativity (split input -> same estimate), which is what makes the
partial-combine plan valid at any partitioning."""

import numpy as np
import polars as pl
import pytest

from aiw_i2b2_etl_ray.pipelines import sketches as sk

SF = "/root/testdata/sf0.001"


def test_hll_error_bound_vs_exact(ray_session):
    import duckdb

    approx = sk.approx_distinct_users(SF).to_pandas()
    con = duckdb.connect()
    exact = con.sql(
        f"SELECT event_type, COUNT(DISTINCT user_id) AS n "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY event_type"
    ).df()
    m = approx.merge(exact, on="event_type")
    assert len(m) == len(exact)
    rel = (m["n_users_approx"] - m["n"]).abs() / m["n"]
    # p=12 -> ~1.6% sigma; 5% is > 3 sigma
    assert rel.max() <= 0.05, m.to_string()


def test_hll_register_fold_is_associative():
    keys = pl.Series([f"user-{i}" for i in range(5000)])
    whole = sk._hll_registers(keys)
    # arbitrary 3-way split, folded pairwise in a different order
    a = sk._hll_registers(keys.slice(0, 1700))
    b = sk._hll_registers(keys.slice(1700, 1300))
    c = sk._hll_registers(keys.slice(3000, 2000))
    folded = np.maximum(np.maximum(c, a), b)
    assert np.array_equal(folded, whole)
    est = sk._hll_estimate(whole)
    assert abs(est - 5000) / 5000 <= 0.05


def test_hll_estimate_small_range_linear_counting():
    keys = pl.Series([f"k{i}" for i in range(30)])
    est = sk._hll_estimate(sk._hll_registers(keys))
    assert est == 30  # linear counting is near-exact far below m


def test_hist_median_within_one_bin_of_exact(ray_session):
    import duckdb

    approx = sk.approx_median_hist(SF).to_pandas()
    con = duckdb.connect()
    exact = con.sql(
        f"SELECT event_type, median(value) AS md "
        f"FROM read_parquet('{SF}/events.parquet') GROUP BY event_type"
    ).df()
    m = approx.merge(exact, on="event_type")
    assert (m["median_approx"] - m["md"]).abs().max() <= sk.HIST_W + 1e-9


def test_ivf_dedup_precision_is_exact_at_low_assign(ray_session):
    """With a deliberately low multi-assign, recall may drop but every
    emitted pair must still be a true pair with its exact cosine
    (precision 1.0) — the in-list verify is exact, not approximate."""
    import duckdb

    from aiw_i2b2_etl_ray.pipelines import dedup as dd

    old = dd.IVF_DEDUP_ASSIGN
    try:
        dd.IVF_DEDUP_ASSIGN = 2
        got = dd.dedup_embedding_ivf(SF).to_pandas()
    finally:
        dd.IVF_DEDUP_ASSIGN = old
    exact = duckdb.sql(
        f"""WITH e AS (SELECT vec_id, embedding FROM read_parquet('{SF}/embeddings.parquet'))
        SELECT a.vec_id va, b.vec_id vb FROM e a JOIN e b ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.embedding, b.embedding) >= {dd.COSINE_TAU}"""
    ).df()
    true_pairs = set(zip(exact["va"], exact["vb"]))
    got_pairs = set(zip(got["vec_a"], got["vec_b"]))
    assert got_pairs <= true_pairs  # precision 1.0
    assert len(got_pairs) >= 0.5 * len(true_pairs)  # sane recall even at 2


def test_connected_components_chain_and_islands(ray_session):
    """A 5-node chain (worst diameter per edge), a triangle, and an
    isolated pair — min-label propagation must label each component by
    its minimum node id, in <= diameter iterations."""
    import pyarrow as pa
    import ray.data as rd

    from aiw_i2b2_etl_ray.pipelines.graph_cc import connected_components

    edges = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([10, 11, 12, 13, 30, 31, 30, 50], pa.int64()),
                "doc_b": pa.array([11, 12, 13, 14, 31, 32, 32, 51], pa.int64()),
            }
        )
    )
    out = connected_components(edges).to_pandas().sort_values("doc_id")
    got = dict(zip(out["doc_id"], out["cluster_id"]))
    assert got == {
        10: 10, 11: 10, 12: 10, 13: 10, 14: 10,
        30: 30, 31: 30, 32: 30,
        50: 50, 51: 50,
    }


def test_connected_components_long_chain_converges(ray_session):
    """A 200-node chain has diameter 199; naive propagation would need 199
    rounds, far beyond max_iters — pointer jumping must converge it in
    O(log n) rounds and label every node with the chain head."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from aiw_i2b2_etl_ray.pipelines.graph_cc import connected_components

    n = 200
    edges = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array(np.arange(n - 1, dtype=np.int64) + 1000),
                "doc_b": pa.array(np.arange(1, n, dtype=np.int64) + 1000),
            }
        )
    )
    out = connected_components(edges, max_iters=12).to_pandas()
    assert len(out) == n
    assert (out["cluster_id"] == 1000).all()


def test_connected_components_random_graphs_match_union_find(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from aiw_i2b2_etl_ray.pipelines.graph_cc import connected_components

    def uf_labels(pairs):
        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in pairs:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {n: find(n) for n in parent}

    rng = np.random.default_rng(3)
    pairs = list({(int(a), int(b)) for a, b in rng.integers(0, 120, (250, 2)) if a != b})
    edges = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array([a for a, _ in pairs], pa.int64()),
                "doc_b": pa.array([b for _, b in pairs], pa.int64()),
            }
        )
    )
    out = connected_components(edges).to_pandas()
    assert dict(zip(out["doc_id"], out["cluster_id"])) == uf_labels(pairs)


def test_connected_components_bulk_random_graph(ray_session):
    """Bulk sanity at 8k edges / 5k nodes (giant-component regime): the
    bucket-vectorized rounds must stay fast (no per-node dispatch) and
    agree with union-find exactly."""
    import pyarrow as pa
    import ray.data as rd

    from aiw_i2b2_etl_ray.pipelines.graph_cc import connected_components

    rng = np.random.default_rng(13)
    a = rng.integers(0, 5000, 8000)
    b = rng.integers(0, 5000, 8000)
    keep = a != b
    edges = rd.from_arrow(
        pa.table(
            {
                "doc_a": pa.array(a[keep], pa.int64()),
                "doc_b": pa.array(b[keep], pa.int64()),
            }
        )
    )
    out = connected_components(edges).to_pandas()

    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for x, y in zip(a[keep], b[keep]):
        rx, ry = find(int(x)), find(int(y))
        if rx != ry:
            parent[max(rx, ry)] = min(rx, ry)
    want = {n: find(n) for n in parent}
    assert dict(zip(out["doc_id"], out["cluster_id"])) == want
