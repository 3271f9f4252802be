"""Eytzinger-layout variant of the native index: bit-for-bit parity.

The reference ships an experimental Eytzinger (BFS-layout) search variant
of its interval index (reference superintervals/src/variants/
superintervals_var.hpp:770-816: SuperIntervalsEytz swaps the start
upper-bound for a branchless Eytzinger descent).  Our analog rebuilds the
three per-probe search arrays (segment-local starts, end-sorted ends,
cummax window floor) in per-segment BFS order — and, unlike the
reference's experimental toggle, it measured 1.8-2.7x faster on this
host so it is the DEFAULT; SEQUILA_NATIVE_LAYOUT=segment at index-build
time opts out.  The layout must be invisible semantically: every query
result matches the segment-binary-search layout exactly.
"""

import os

import numpy as np
import pytest

from sequila_tpu.ops.oracle import oracle_counts

native = pytest.importorskip("sequila_tpu.native.loader")


@pytest.fixture(scope="module")
def lib_available():
    if not native.available():
        pytest.skip("native toolchain unavailable")


@pytest.fixture()
def eytz_env():
    old = os.environ.get("SEQUILA_NATIVE_LAYOUT")
    os.environ["SEQUILA_NATIVE_LAYOUT"] = "eytzinger"
    try:
        yield
    finally:
        if old is None:
            del os.environ["SEQUILA_NATIVE_LAYOUT"]
        else:
            os.environ["SEQUILA_NATIVE_LAYOUT"] = old


def _build_pair(bk, bs, be):
    """(segment-layout index, eytzinger-layout index) over the same data."""
    old = os.environ.get("SEQUILA_NATIVE_LAYOUT")
    try:
        os.environ["SEQUILA_NATIVE_LAYOUT"] = "segment"
        base = native.NativeIntervalIndex(bk, bs, be)
        os.environ["SEQUILA_NATIVE_LAYOUT"] = "eytzinger"
        eytz = native.NativeIntervalIndex(bk, bs, be)
    finally:
        if old is None:
            os.environ.pop("SEQUILA_NATIVE_LAYOUT", None)
        else:
            os.environ["SEQUILA_NATIVE_LAYOUT"] = old
    return base, eytz


def test_layout_flag_engages(lib_available, eytz_env):
    idx = native.NativeIntervalIndex(
        np.array([0, 1], np.int32),
        np.array([0, 5], np.int32),
        np.array([3, 9], np.int32),
    )
    assert idx.layout == "eytzinger"


def test_layout_default_is_eytzinger(lib_available):
    os.environ.pop("SEQUILA_NATIVE_LAYOUT", None)
    idx = native.NativeIntervalIndex(
        np.array([0], np.int32), np.array([0], np.int32), np.array([3], np.int32)
    )
    assert idx.layout == "eytzinger"


def test_layout_segment_opt_out(lib_available):
    old = os.environ.get("SEQUILA_NATIVE_LAYOUT")
    os.environ["SEQUILA_NATIVE_LAYOUT"] = "segment"
    try:
        idx = native.NativeIntervalIndex(
            np.array([0], np.int32),
            np.array([0], np.int32),
            np.array([3], np.int32),
        )
        assert idx.layout == "segment"
    finally:
        if old is None:
            del os.environ["SEQUILA_NATIVE_LAYOUT"]
        else:
            os.environ["SEQUILA_NATIVE_LAYOUT"] = old


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_eytzinger_counts_parity(lib_available, seed):
    rng = np.random.default_rng(seed)
    n, m = 4000, 3000
    bk = rng.integers(0, 7, n).astype(np.int32)
    bs = rng.integers(0, 20000, n).astype(np.int32)
    be = bs + rng.integers(0, 500, n).astype(np.int32)
    qk = rng.integers(0, 9, m).astype(np.int32)  # some keys miss the index
    qs = rng.integers(0, 20000, m).astype(np.int32)
    qe = qs + rng.integers(0, 500, m).astype(np.int32)
    base, eytz = _build_pair(bk, bs, be)
    assert eytz.layout == "eytzinger" and base.layout == "segment"
    np.testing.assert_array_equal(
        eytz.counts(qk, qs, qe), base.counts(qk, qs, qe)
    )
    # and both against the brute-force oracle on a slice
    np.testing.assert_array_equal(
        eytz.counts(qk[:300], qs[:300], qe[:300]),
        oracle_counts(bk, bs, be, qk[:300], qs[:300], qe[:300]),
    )


def test_eytzinger_tie_heavy_segments(lib_available):
    # many duplicate starts/ends inside one segment: the BFS rank map must
    # return the same bound as std::upper/lower_bound under ties
    bk = np.zeros(64, np.int32)
    bs = np.repeat(np.arange(8, dtype=np.int32) * 10, 8)
    be = bs + np.tile(np.arange(8, dtype=np.int32), 8)
    qk = np.zeros(32, np.int32)
    qs = np.arange(32, dtype=np.int32)
    qe = qs + 5
    base, eytz = _build_pair(bk, bs, be)
    np.testing.assert_array_equal(
        eytz.counts(qk, qs, qe), base.counts(qk, qs, qe)
    )


def test_eytzinger_degenerate_and_inverted_fall_back(lib_available):
    # stabbing probes (qs > qe) and inverted builds bypass BITS entirely;
    # the variant must not change the window-scan fallback's results
    bk = np.array([0, 0, 0], np.int32)
    bs = np.array([0, 50, 100], np.int32)
    be = np.array([200, 40, 150], np.int32)  # one inverted (50 > 40)
    qk = np.array([0, 0], np.int32)
    qs = np.array([60, 10], np.int32)
    qe = np.array([10, 120], np.int32)  # first probe is stabbing
    base, eytz = _build_pair(bk, bs, be)
    np.testing.assert_array_equal(
        eytz.counts(qk, qs, qe), base.counts(qk, qs, qe)
    )


def test_eytzinger_singleton_and_two_element_segments(lib_available):
    # tree shapes the descent must handle: len 1 (root only) and len 2
    # (left child only)
    bk = np.array([0, 1, 1, 2, 2, 2], np.int32)
    bs = np.array([5, 1, 9, 0, 4, 8], np.int32)
    be = bs + 2
    qk = np.array([0, 0, 1, 1, 2, 2, 3], np.int32)
    qs = np.array([0, 6, 0, 9, 3, 100, 0], np.int32)
    qe = qs + 3
    base, eytz = _build_pair(bk, bs, be)
    np.testing.assert_array_equal(
        eytz.counts(qk, qs, qe), base.counts(qk, qs, qe)
    )


def test_eytzinger_pairs_nearest_coverage_unchanged(lib_available, rng):
    # every entry point routes its segment searches through the layout;
    # all must keep identical results on an eytzinger-built index
    n, m = 800, 500
    bk = rng.integers(0, 4, n).astype(np.int32)
    bs = rng.integers(0, 8000, n).astype(np.int32)
    be = bs + rng.integers(0, 300, n).astype(np.int32)
    qk = rng.integers(0, 5, m).astype(np.int32)
    qs = rng.integers(0, 8000, m).astype(np.int32)
    qe = qs + rng.integers(0, 300, m).astype(np.int32)
    base, eytz = _build_pair(bk, bs, be)
    nb, npr = eytz.pairs(qk, qs, qe)
    rb, rp = base.pairs(qk, qs, qe)
    np.testing.assert_array_equal(nb, rb)
    np.testing.assert_array_equal(npr, rp)
    np.testing.assert_array_equal(
        eytz.nearest(qk, qs, qe), base.nearest(qk, qs, qe)
    )
    ec, ebs = eytz.coverage(qk, qs, qe)
    bc, bbs = base.coverage(qk, qs, qe)
    np.testing.assert_array_equal(ec, bc)
    np.testing.assert_array_equal(ebs, bbs)
    er, ed = eytz.closest_k(qk, qs, qe, 3)
    br, bd = base.closest_k(qk, qs, qe, 3)
    np.testing.assert_array_equal(ed, bd)
    np.testing.assert_array_equal(er, br)
