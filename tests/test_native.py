"""Native C++ host index: build + parity vs NumPy host path and oracles."""

import numpy as np
import pytest

from sequila_tpu.ops.host_join import HostIntervalIndex
from sequila_tpu.ops.oracle import oracle_counts, oracle_pairs

native = pytest.importorskip("sequila_tpu.native.loader")


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native toolchain unavailable")


def _tables(rng, n, m):
    bk = rng.integers(0, 5, n).astype(np.int32)
    bs = rng.integers(0, 5000, n).astype(np.int32)
    be = bs + rng.integers(0, 400, n).astype(np.int32)
    qk = rng.integers(0, 6, m).astype(np.int32)
    qs = rng.integers(0, 5000, m).astype(np.int32)
    qe = qs + rng.integers(0, 400, m).astype(np.int32)
    return bk, bs, be, qk, qs, qe


def test_native_counts_match_oracle(lib_available, rng):
    bk, bs, be, qk, qs, qe = _tables(rng, 500, 300)
    idx = native.NativeIntervalIndex(bk, bs, be)
    np.testing.assert_array_equal(
        idx.counts(qk, qs, qe), oracle_counts(bk, bs, be, qk, qs, qe)
    )


def test_native_degenerate_stabbing(lib_available):
    idx = native.NativeIntervalIndex(
        np.array([0], np.int32), np.array([0], np.int32), np.array([100], np.int32)
    )
    got = idx.counts(
        np.array([0], np.int32), np.array([50], np.int32), np.array([10], np.int32)
    )
    assert got[0] == 1  # [0,100] stabs the inverted query


def test_native_pairs_match_numpy(lib_available, rng):
    bk, bs, be, qk, qs, qe = _tables(rng, 400, 250)
    nat = native.NativeIntervalIndex(bk, bs, be)
    ref = HostIntervalIndex(bk, bs, be)
    nb, npr = nat.pairs(qk, qs, qe)
    rb, rp = ref.pairs(qk, qs, qe)
    assert sorted(zip(npr.tolist(), nb.tolist())) == sorted(
        zip(rp.tolist(), rb.tolist())
    )
    ob, op = oracle_pairs(bk, bs, be, qk, qs, qe)
    assert sorted(zip(npr.tolist(), nb.tolist())) == sorted(
        zip(op.tolist(), ob.tolist())
    )


def test_native_nearest_matches_numpy(lib_available, rng):
    bk, bs, be, qk, qs, qe = _tables(rng, 300, 200)
    nat = native.NativeIntervalIndex(bk, bs, be)
    ref = HostIntervalIndex(bk, bs, be)
    got = nat.nearest(qk, qs, qe)
    want = ref.nearest(qk, qs, qe)
    for i in range(len(qk)):
        if want[i] == -1 or got[i] == -1:
            assert want[i] == got[i], i
            continue
        # equal distance / overlap class (identity may differ on ties)
        def d(j):
            if be[j] < qs[i]:
                return qs[i] - be[j]
            if bs[j] > qe[i]:
                return bs[j] - qe[i]
            return 0
        assert d(got[i]) == d(want[i]), i


def test_native_coverage(lib_available, rng):
    bk, bs, be, qk, qs, qe = _tables(rng, 300, 150)
    nat = native.NativeIntervalIndex(bk, bs, be)
    c, b = nat.coverage(qk, qs, qe)
    for i in range(len(qk)):
        mask = (bk == qk[i]) & (bs <= qe[i]) & (be >= qs[i])
        assert c[i] == mask.sum()
        want = np.sum(
            np.minimum(be[mask], qe[i]).astype(np.int64)
            - np.maximum(bs[mask], qs[i])
        )
        assert b[i] == want


def test_numpy_host_path_parity_with_oracle(rng):
    """The pure-NumPy fallback is exact too (SEQUILA_NATIVE=0 path)."""
    bk, bs, be, qk, qs, qe = _tables(rng, 350, 220)
    ref = HostIntervalIndex(bk, bs, be)
    np.testing.assert_array_equal(
        ref.counts(qk, qs, qe), oracle_counts(bk, bs, be, qk, qs, qe)
    )
