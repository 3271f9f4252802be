import numpy as np, jax, jax.numpy as jnp, time
print("devices:", jax.devices(), flush=True)
from sequila_tpu.ops.interval_index import build_interval_index
from sequila_tpu.ops.interval_join import count_matches, materialize_pairs
from sequila_tpu.ops.oracle import oracle_counts, oracle_pairs

rng = np.random.default_rng(123)
t0 = time.time()
N, M = 2048, 4096
for trial in range(10):
    nk = int(rng.integers(1, 6))
    span = int(rng.choice([100, 5000, 10**6]))
    wid = int(rng.choice([1, 50, 2000]))
    lk = rng.integers(0, nk, N).astype(np.int32)
    ls = rng.integers(0, span, N).astype(np.int32)
    le = ls + rng.integers(0, wid + 1, N).astype(np.int32)
    rk = rng.integers(0, nk + 1, M).astype(np.int32)
    rs = rng.integers(0, span, M).astype(np.int32)
    re = rs + rng.integers(0, wid + 1, M).astype(np.int32)
    if trial % 3 == 0:
        deg = rng.random(M) < 0.1
        rs2 = rs.copy(); rs2[deg] = re[deg] + rng.integers(1, 10, int(deg.sum())).astype(np.int32)
        rs = rs2
    want = oracle_counts(lk, ls, le, rk, rs, re)
    index = build_interval_index(jnp.asarray(lk), jnp.asarray(ls), jnp.asarray(le))
    for method in ("sort", "bsearch"):
        got = np.asarray(count_matches(index, jnp.asarray(rk), jnp.asarray(rs), jnp.asarray(re), method))
        assert (got == want).all(), (trial, method)
    if not (rs > re).any():
        got = np.asarray(count_matches(index, jnp.asarray(rk), jnp.asarray(rs), jnp.asarray(re), "bits"))
        assert (got == want).all(), (trial, "bits")
    if trial % 4 == 1:
        b, p, total = materialize_pairs(index, jnp.asarray(rk), jnp.asarray(rs), jnp.asarray(re))
        ob, op = oracle_pairs(lk, ls, le, rk, rs, re)
        assert sorted(zip(p.tolist(), b.tolist())) == sorted(zip(op.tolist(), ob.tolist())), (trial, "pairs")
    print(f"trial {trial}: keys={nk} span={span} wid={wid} total={int(want.sum())} OK [{time.time()-t0:.0f}s]", flush=True)
print(f"DEVICE FUZZ PASSED: 10 trials in {time.time()-t0:.0f}s", flush=True)
