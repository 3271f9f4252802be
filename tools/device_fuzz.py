"""Randomized device-vs-oracle kernel fuzz on the real TPU chip.

Complements tools/tpu_sweep.py (fixed checks): random data in FIXED
shape buckets so XLA compiles once per kernel.  Run:

    timeout 590 python tools/device_fuzz.py [trials]
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(trials: int = 6) -> None:
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    from sequila_tpu.ops.interval_index import build_interval_index
    from sequila_tpu.ops.interval_join import count_matches, materialize_pairs
    from sequila_tpu.ops.oracle import oracle_counts, oracle_pairs

    rng = np.random.default_rng(123)
    t0 = time.time()
    N, M = 2048, 4096
    for trial in range(trials):
        nk = int(rng.integers(1, 6))
        span, wid = 20_000, 60  # fixed scale: level structure stays in one bucket
        lk = rng.integers(0, nk, N).astype(np.int32)
        ls = rng.integers(0, span, N).astype(np.int32)
        le = ls + rng.integers(0, wid + 1, N).astype(np.int32)
        rk = rng.integers(0, nk + 1, M).astype(np.int32)
        rs = rng.integers(0, span, M).astype(np.int32)
        re = rs + rng.integers(0, wid + 1, M).astype(np.int32)
        if trial % 3 == 0:
            deg = rng.random(M) < 0.1
            rs2 = rs.copy()
            rs2[deg] = re[deg] + rng.integers(1, 10, int(deg.sum())).astype(np.int32)
            rs = rs2
        want = oracle_counts(lk, ls, le, rk, rs, re)
        index = build_interval_index(jnp.asarray(lk), jnp.asarray(ls), jnp.asarray(le))
        for method in ("sort", "bsearch"):
            got = np.asarray(
                count_matches(index, jnp.asarray(rk), jnp.asarray(rs), jnp.asarray(re), method)
            )
            assert (got == want).all(), (trial, method)
        if not (rs > re).any():
            got = np.asarray(
                count_matches(index, jnp.asarray(rk), jnp.asarray(rs), jnp.asarray(re), "bits")
            )
            assert (got == want).all(), (trial, "bits")
        if trial % 2 == 1:
            b, p, _total = materialize_pairs(
                index, jnp.asarray(rk), jnp.asarray(rs), jnp.asarray(re)
            )
            ob, op = oracle_pairs(lk, ls, le, rk, rs, re)
            assert sorted(zip(p.tolist(), b.tolist())) == sorted(
                zip(op.tolist(), ob.tolist())
            ), (trial, "pairs")
        print(
            f"trial {trial}: keys={nk} total={int(want.sum())} OK "
            f"[{time.time() - t0:.0f}s]",
            flush=True,
        )
    print(f"DEVICE FUZZ PASSED: {trials} trials in {time.time() - t0:.0f}s")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
