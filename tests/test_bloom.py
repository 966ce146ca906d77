"""Bloom filter sketch (stats.BloomFilter / bloom_build / bloom_probe)."""

import numpy as np
import pyarrow as pa
import pytest

from medea_ray.engine import stats as st


def _keys(n, prefix="k"):
    return pa.array([f"{prefix}{i}" for i in range(n)], pa.string())


def test_no_false_negatives_strings_and_ints():
    for col in (_keys(5000), pa.array(list(range(5000)), pa.int64())):
        bf = st.BloomFilter(1 << 16, 7)
        bf.add_batch(col)
        assert bf.n_added == 5000
        assert bf.contains_batch(col).all()


def test_merge_equals_single_build_bit_exact():
    col = _keys(4000)
    whole = st.BloomFilter(1 << 15, 5)
    whole.add_batch(col)
    merged = st.BloomFilter(1 << 15, 5)
    for lo in range(0, 4000, 137):
        part = st.BloomFilter(1 << 15, 5)
        part.add_batch(col.slice(lo, 137))
        merged.merge(part)
    assert np.array_equal(whole.words, merged.words)
    assert merged.n_added == whole.n_added == 4000


def test_fp_rate_within_bound():
    bf = st.BloomFilter(1 << 16, 7)
    bf.add_batch(_keys(5000))
    absent = _keys(20000, prefix="absent")
    fp = int(bf.contains_batch(absent).sum())
    bound = bf.fp_rate_bound()
    assert fp <= 20000 * bound * 3 + 10, (fp, bound)
    assert fp > 0 or bound < 1e-3  # non-vacuous at this fill unless tiny


def test_nulls_ignored_on_add_probe_false():
    bf = st.BloomFilter(1 << 12, 4)
    bf.add_batch(pa.array(["x", None, "y"], pa.string()))
    assert bf.n_added == 2
    assert bf.contains_batch(pa.array(["x", "y"], pa.string())).all()


def test_param_validation():
    with pytest.raises(ValueError, match="power of two"):
        st.BloomFilter(1000, 3)
    a, b = st.BloomFilter(1 << 10, 3), st.BloomFilter(1 << 11, 3)
    with pytest.raises(ValueError, match="mismatch"):
        a.merge(b)


def test_distributed_build_bit_identical_and_tree_combined(ray_session):
    import ray.data as rd

    col = _keys(6000)
    ds = rd.from_arrow(pa.table({"key": col})).repartition(24)
    # batch_size 64 -> ~94 partials, max_driver_states 4 -> multiple
    # tree-combine levels actually run
    bf = st.bloom_build(
        ds, "key", n_bits=1 << 14, n_hashes=5, batch_size=64, max_driver_states=4
    )
    ref = st.BloomFilter(1 << 14, 5)
    ref.add_batch(col)
    assert np.array_equal(bf.words, ref.words)
    assert bf.n_added == 6000


def test_bloom_probe_row_aligned_with_nulls(ray_session):
    import ray.data as rd

    bf = st.BloomFilter(1 << 14, 5)
    bf.add_batch(pa.array(["p0", "p1"], pa.string()))
    tbl = pa.table(
        {"id": [0, 1, 2, 3], "key": pa.array(["p0", None, "nope-xyz", "p1"], pa.string())}
    )
    out = (
        st.bloom_probe(rd.from_arrow(tbl), "key", bf)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    assert out["maybe_seen"][0] and out["maybe_seen"][3]
    assert not out["maybe_seen"][1]  # null -> False, row-aligned
