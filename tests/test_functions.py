"""Unit tests for the scalar-function catalog (SURVEY.md §2.8) and sketches."""

import numpy as np
import pyarrow as pa
import pytest

from aiw_i2b2_etl_ray.functions import dates, eav, hashing, sketch, strings


def test_null_to_sentinel():
    out = strings.null_to_sentinel(pa.array([None, "", "abcdef"]), max_len=3)
    assert out.to_pylist() == ["@", "@", "abc"]


def test_full_name():
    out = strings.full_name(
        pa.array(["Doe", "Solo", None]),
        pa.array(["Jane", None, "Only"]),
        pa.array(["Q", None, None]),
    )
    assert out.to_pylist() == ["Doe, Jane Q", "Solo", "Only"]


def test_hierarchy_path():
    out = strings.hierarchy_path(pa.array(["A"]), pa.array(["B"]), pa.array(["C"]))
    assert out.to_pylist() == ["\\A\\B\\C\\"]


def test_blob_join_escapes():
    out = strings.blob_join([pa.array(["a|b"]), pa.array(["c\\d"])])
    assert out.to_pylist() == ["a\\|b|c\\\\d"]


def test_concept_code_truncation_collision_free():
    long = pa.array(["x" * 80, "x" * 80 + "y"])
    out = strings.concept_code(long).to_pylist()
    assert all(len(c) <= 50 for c in out)
    assert out[0] != out[1], "distinct inputs must keep distinct codes"
    short = strings.concept_code(pa.array(["diag"]), pa.array(["9"])).to_pylist()
    assert short == ["diag:9"]


def test_eav_numeric_and_text():
    num = eav.encode_numeric(pa.array([1.5, None]))
    assert num["valtype_cd"].to_pylist() == ["N", "@"]
    assert num["tval_char"].to_pylist() == ["E", None]
    txt = eav.encode_text(pa.array(["hello", None, "x" * 300]))
    assert txt["valtype_cd"].to_pylist() == ["T", "@", "T"]
    assert len(txt["tval_char"].to_pylist()[2]) == 255  # truncation


def test_eav_inequality_codes():
    comp = pa.array(["<", ">=", "!="])
    out = eav.encode_numeric(pa.array([1.0, 2.0, 3.0]), comparator=comp)
    assert out["tval_char"].to_pylist() == ["L", "GE", "NE"]


def test_active_status_code():
    s = pa.array([1, None], pa.timestamp("us"))
    e = pa.array([None, None], pa.timestamp("us"))
    assert dates.active_status_code(s, e).to_pylist() == ["UD", "UL"]


def test_vital_status_code():
    out = dates.vital_status_code(pa.array([True, False, None]))
    assert out.to_pylist() == ["Y", "N", "X"]


def test_seq_to_timestamp_roundtrip():
    ts = dates.seq_to_timestamp(pa.array([0, 1_000_000]))
    assert ts.type == pa.timestamp("us")
    assert ts[1].as_py().second == 1


def test_sha256_matches_hashlib():
    import hashlib

    vals = ["", "abc", None, "unicode ✓"]
    out = hashing.sha256_hex(pa.array(vals, pa.large_string())).to_pylist()
    for v, h in zip(vals, out):
        if v is None:
            assert h is None
        else:
            assert h == hashlib.sha256(v.encode()).hexdigest()


def test_bucket_hash_stable_and_bounded():
    t = pa.table({"a": ["x", "y", "x"], "b": ["1", "2", "1"]})
    h1 = hashing.bucket_hash(t, ["a", "b"], 16).to_pylist()
    h2 = hashing.bucket_hash(t, ["a", "b"], 16).to_pylist()
    assert h1 == h2
    assert h1[0] == h1[2] and all(0 <= v < 16 for v in h1)


def test_minhash_similarity_monotone():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a.replace("lazy", "sleepy")
    c = "completely different words entirely unrelated text here"
    sigs = sketch.minhash_signatures(pa.array([a, b, c]))
    sim_ab = (sigs[0] == sigs[1]).mean()
    sim_ac = (sigs[0] == sigs[2]).mean()
    assert sim_ab > 0.5 > sim_ac


def test_simhash_hamming_monotone():
    a = "the quick brown fox jumps over the lazy dog " * 5
    b = a.replace("lazy", "sleepy")
    c = "completely different words entirely unrelated text here"
    h = sketch.simhash64(pa.array([a, b, c]))
    d_ab = sketch.hamming64(h[:1], h[1:2])[0]
    d_ac = sketch.hamming64(h[:1], h[2:3])[0]
    assert d_ab < d_ac


def test_jaccard_bounds():
    assert sketch.jaccard("a b c d", "a b c d") == 1.0
    assert sketch.jaccard("a b c", "x y z") == 0.0


def test_rolling_fingerprint_deterministic():
    col = pa.array(["hello world " * 10, "hello world " * 10, "other"])
    fp = hashing.rolling_fingerprint(col).to_pylist()
    assert fp[0] == fp[1] != fp[2]


def test_round_half_away():
    from aiw_i2b2_etl_ray.functions.numeric import round_half_away, round_half_away_pc

    assert round_half_away(np.array([4.28125]), 4)[0] == pytest.approx(4.2813)
    assert round_half_away_pc(pa.array([4.28125]), 4).to_pylist()[0] == pytest.approx(
        4.2813
    )


def test_round_half_away_pc_is_canonical():
    """pc.round passes a value one ULP above an exactly-2-decimal double
    through unchanged, which made every ROUND(SUM(..)) oracle hash flaky
    (sums land on ULP neighbors depending on block combination order).
    The engine kernel must return the canonical nearest double, matching
    DuckDB's scale-then-true-divide, for BOTH neighbors of the decimal."""
    import duckdb
    import numpy as np
    import pyarrow as pa

    from aiw_i2b2_etl_ray.functions.numeric import round_half_away_pc

    canonical = 127084565.24
    up = np.nextafter(canonical, np.inf)
    vals = [canonical, up, 190043171.82500002, 0.82505, -2.345, 0.0]
    got = round_half_away_pc(pa.array(vals), 2).to_pylist()
    want = [
        duckdb.sql(f"SELECT ROUND({v!r}::DOUBLE, 2)").fetchone()[0] for v in vals
    ]
    assert got == want, (got, want)
    # bit-identical, not just ==: the driver compare hashes str() forms
    assert [repr(g) for g in got] == [repr(w) for w in want]


def test_vectorized_md5_matches_hashlib():
    """The mixing family's sampling draws key on md5(str(doc_id));
    the vectorized single-block kernel must be bit-identical to hashlib
    (and therefore to DuckDB's md5()) across digit-count boundaries and
    the int64 extremes."""
    import hashlib

    import numpy as np

    from aiw_i2b2_etl_ray.functions.hashing import (
        md5_hex_of_ints,
        md5_uniform32_of_ints,
        md5_uniform52_of_ints,
    )

    edge = [0, 1, 9, 10, 99, 100, 123456789, 2**31, 2**62, 2**63 - 1]
    rng = np.random.default_rng(11)
    ids = np.concatenate([np.array(edge, np.int64), rng.integers(0, 2**63 - 1, 2000)])
    refs = [hashlib.md5(str(i).encode()).hexdigest() for i in ids]
    assert list(md5_hex_of_ints(ids)) == refs
    assert np.allclose(
        md5_uniform32_of_ints(ids), [int(r[:8], 16) / 2**32 for r in refs]
    )
    assert np.allclose(
        md5_uniform52_of_ints(ids), [int(r[:13], 16) / 2**52 for r in refs]
    )


def test_md5_of_ints_rejects_negative_ids():
    """A negative id would wrap to a signless 20-digit decimal (wrong vs
    DuckDB md5(CAST(id AS VARCHAR)) and outside the kernel's word-0..4
    nonzero assumption) — the kernel must fail loudly, not hash wrong."""
    import numpy as np
    import pytest

    from aiw_i2b2_etl_ray.functions.hashing import md5_digests_of_ints

    with pytest.raises(ValueError):
        md5_digests_of_ints(np.array([3, -1], dtype=np.int64))


def test_rolling_fingerprint_masked_validity_extents():
    """Arrow permits null slots with NON-zero offset extents (validity
    mask over pre-filled buffers); such slots must fingerprint to 0 and
    their garbage bytes must not leak into neighbors' minima."""
    import numpy as np
    import pyarrow as pa

    from aiw_i2b2_etl_ray.functions.hashing import rolling_fingerprint

    base = pa.array(
        ["hello world over the window", "GARBAGEBYTES" * 3, "quick brown fox jumps"]
    )
    bufs = base.buffers()
    validity = np.array([0b101], np.uint8)  # row 1 null, extent kept
    masked = pa.Array.from_buffers(
        pa.string(), len(base), [pa.py_buffer(validity.tobytes()), bufs[1], bufs[2]]
    )
    ref = pa.array([base[0].as_py(), None, base[2].as_py()])
    assert rolling_fingerprint(masked).to_pylist() == rolling_fingerprint(ref).to_pylist()
    # sliced view of the masked array keeps the bitmap offset math right
    assert (
        rolling_fingerprint(masked.slice(1, 2)).to_pylist()
        == rolling_fingerprint(ref.slice(1, 2)).to_pylist()
    )
