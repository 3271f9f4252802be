"""Cost structure of the BITS count kernel + packed-key variants."""
import functools, sys, time
import numpy as np
import jax, jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from bench import gen_genome_table

N, M = 2_350_965, 7_684_066

def make(n, seed):
    t = gen_genome_table(n, seed)
    k = np.unique(t["contig"], return_inverse=True)[1].astype(np.int32)
    return k, t["pos_start"].astype(np.int32), t["pos_end"].astype(np.int32)

lk, ls, le = make(N, 21)
rk, rs, re = make(M, 22)

def bucket(n):
    return -(-n // 65536) * 65536

n_pad, m_pad = bucket(N), bucket(M)
NM = n_pad + m_pad
print("n_pad", n_pad, "m_pad", m_pad, "NM", NM)

rng = np.random.default_rng(0)
a32 = jnp.asarray(rng.integers(0, 2**31 - 1, NM, dtype=np.int32))
b32 = jnp.asarray(rng.integers(0, 2**31 - 1, NM, dtype=np.int32))
c32 = jnp.asarray(rng.integers(0, 2, NM, dtype=np.int32))
u32 = jnp.asarray(rng.integers(0, 2**32 - 1, NM, dtype=np.uint32))
u32b = jnp.asarray(rng.integers(0, 2**32 - 1, (2, NM), dtype=np.uint32))

def timeit(name, fn):
    fn()
    ts = []
    for _ in range(4):
        t0 = time.perf_counter(); r = fn(); ts.append(time.perf_counter() - t0)
    print(f"{name}: {min(ts)*1000:.1f} ms")

j = jax.jit

s3 = j(lambda a, b, c: jax.lax.sort((a, b, c), num_keys=3)[0][-1])
s2 = j(lambda a, b: jax.lax.sort((a, b), num_keys=2)[0][-1])
s2p = j(lambda a, b: jax.lax.sort((a, b), num_keys=1, is_stable=True)[0][-1])
s1 = j(lambda a: jax.lax.sort((a,), num_keys=1)[0][-1])
s1b = j(lambda a: jax.lax.sort(a, dimension=1)[0, -1])
cs = j(lambda a: jnp.cumsum(a)[-1])
gth = j(lambda t, idx: t[idx][-1])

timeit("sort 1key+payload stable", lambda: np.asarray(s2p(a32, c32)))
timeit("sort 1key uint32  ", lambda: np.asarray(s1(u32)))
timeit("sort 1key batched2", lambda: np.asarray(s1b(u32b)))
timeit("cumsum 10M        ", lambda: np.asarray(cs(c32)))
small_tab = jnp.asarray(rng.integers(0, 100, 64, dtype=np.int32))
idx10m = jnp.asarray(rng.integers(0, 64, NM, dtype=np.int32))
timeit("gather 10M from 64-elem table", lambda: np.asarray(gth(small_tab, idx10m)))

# full packed kernel prototype: gpos = offset[k] + (v - minv[k]), *2 | flag
# human-genome-like span: 24 contigs x up to 248M = ~3.1G -> needs uint32
# without flag bit; bench data span = sum sizes = 24*(248-8i) ~ 2.9G.
sizes = np.array([(248 - 8 * i) * 1_000_000 for i in range(24)], np.int64)
offs = np.concatenate([[0], np.cumsum(sizes + 2)])
print("total span:", offs[-1], "fits u32:", offs[-1] < 2**32, "fits u31:", offs[-1] < 2**31)

offs_d = jnp.asarray(offs[:24].astype(np.uint32))

@j
def packed_2op(bk, bv, qk, qv):
    # side='right': build before query on ties -> stable, build first
    gk = jnp.concatenate([
        offs_d[bk] + bv.astype(jnp.uint32),
        offs_d[qk] + qv.astype(jnp.uint32),
    ])
    flag = jnp.concatenate([
        jnp.zeros((bk.shape[0],), jnp.int32),
        jnp.ones((qk.shape[0],), jnp.int32),
    ])
    _, f_s = jax.lax.sort((gk, flag), num_keys=1, is_stable=True)
    isb = 1 - f_s
    bcount = jnp.cumsum(isb) - isb
    contrib = jnp.where(f_s == 1, bcount, 0)
    return contrib.reshape(-1, 64).sum(axis=1)

@j
def packed_2key(bk, bv, qk, qv):
    gk = jnp.concatenate([
        offs_d[bk] + bv.astype(jnp.uint32),
        offs_d[qk] + qv.astype(jnp.uint32),
    ])
    flag = jnp.concatenate([
        jnp.zeros((bk.shape[0],), jnp.int32),
        jnp.ones((qk.shape[0],), jnp.int32),
    ])
    gk_s, f_s = jax.lax.sort((gk, flag), num_keys=2)
    isb = 1 - f_s
    bcount = jnp.cumsum(isb) - isb
    contrib = jnp.where(f_s == 1, bcount, 0)
    return contrib.reshape(-1, 64).sum(axis=1)

def padd(a, fill, size):
    return jnp.asarray(np.concatenate([a, np.full(size - len(a), fill, a.dtype)]))

# pad keys to last contig id + clamp values (just for timing realism)
bk_p = padd(lk, np.int32(23), n_pad); bs_p = padd(ls, np.int32(0), n_pad)
qk_p = padd(rk, np.int32(23), m_pad); qe_p = padd(re % (240 * 10**6), np.int32(0), m_pad)
qe_p = jnp.asarray(np.minimum(np.asarray(qe_p), 240 * 10**6))

timeit("packed 1key+stable payload kernel", lambda: np.asarray(packed_2op(bk_p, bs_p, qk_p, qe_p)))
timeit("packed 2key kernel", lambda: np.asarray(packed_2key(bk_p, bs_p, qk_p, qe_p)))

from sequila_tpu.ops.interval_join import _sum_rank_partials
full3 = j(lambda bk, bv, qk, qv: _sum_rank_partials(bk, bv, qk, qv, "right"))
timeit("current 3key kernel (one side)", lambda: np.asarray(full3(bk_p, bs_p, qk_p, qe_p)))
