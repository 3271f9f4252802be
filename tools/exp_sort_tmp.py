"""Round-4 cost experiments for the Genome-Genome count: sort-operand
width (3-key vs packed-u32 2-key vs stable 1-key) and the bsearch
alternative over cached sorted views."""
import sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")

N, M = 2_359_296, 7_733_248  # padded genome sides (multiples of 2048/64)
NM = N + M
rng = np.random.default_rng(0)

k32 = jnp.asarray(rng.integers(0, 24, NM, dtype=np.int32))
v32 = jnp.asarray(rng.integers(0, 2**31 - 1, NM, dtype=np.int32))
u32 = jnp.asarray(rng.integers(0, 2**32 - 1, NM, dtype=np.uint32))
flag = jnp.asarray((np.arange(NM) >= N).astype(np.int32))

def timeit(name, fn):
    fn()
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); np.asarray(fn()); ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms", flush=True)

j = jax.jit

def reduce_side(f):
    isb = 1 - f
    bc = jnp.cumsum(isb) - isb
    return jnp.where(f == 1, bc, 0).reshape(-1, 64).sum(axis=1)

@j
def sort3():  # current _sum_rank_partials shape
    _, _, fs = jax.lax.sort((k32, v32, flag), num_keys=3)
    return reduce_side(fs)

@j
def sort2_packed():  # (u32 packed, flag) both keys
    _, fs = jax.lax.sort((u32, flag), num_keys=2)
    return reduce_side(fs)

@j
def sort1_stable():  # u32 key, stable, flag payload
    _, fs = jax.lax.sort((u32, flag), num_keys=1, is_stable=True)
    return reduce_side(fs)

timeit("sort3 (k,v,flag) nk=3 10.1M", sort3)
timeit("sort2 (u32,flag) nk=2 10.1M", sort2_packed)
timeit("sort1 stable u32 +payload  ", sort1_stable)

# bsearch: 2.36M sorted-build boundaries ranked in 7.73M sorted probes
bq = jnp.asarray(np.sort(rng.integers(0, 2**32 - 1, N, dtype=np.uint32)))
pt = jnp.asarray(np.sort(rng.integers(0, 2**32 - 1, M, dtype=np.uint32)))

@j
def bsearch_small_in_big():
    r = jnp.searchsorted(pt, bq, side="right", method="scan")
    return r.reshape(-1, 64).sum(axis=1)

timeit("searchsorted 2.36M in 7.73M", bsearch_small_in_big)
