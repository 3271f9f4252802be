"""Genome-scale parity gate (VERDICT round-1 item 3).

The reference's correctness anchor (154,374,873 output rows on
chainRn4_chr1 x chainVicPac2_chr1, reference
sandbox/datafusion_baseline.md:8) cannot be reproduced offline — the
databio blobs are absent from this image (`bench.py --databio` documents
the one-command protocol for when they are available).  The honest
substitute asserted here, at the reference's full-genome row counts
(2,350,965 x 7,684,066, duckdb_baseline.txt:158,166):

- full-scale: device fused-BITS count == host C++ count (~99M pairs);
- sampled probes: level-path counts == BITS == host, row for row;
- sampled probes: device-materialized pairs == brute-force oracle pairs.

Everything is slow-marked; ~1 minute total on the CPU test mesh.
"""

import numpy as np
import pytest

import jax.numpy as jnp

pytestmark = pytest.mark.slow

N_BUILD, N_PROBE = 2_350_965, 7_684_066  # chainRn4 / chainVicPac2 full rows


@pytest.fixture(scope="module")
def genome():
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import gen_genome_table

    t1 = gen_genome_table(N_BUILD, 21)
    t2 = gen_genome_table(N_PROBE, 22)
    enc = {f"chr{i + 1}": i for i in range(24)}
    lk = np.array([enc[c] for c in t1["contig"]], np.int32)
    rk = np.array([enc[c] for c in t2["contig"]], np.int32)
    return (
        lk, t1["pos_start"].astype(np.int32), t1["pos_end"].astype(np.int32),
        rk, t2["pos_start"].astype(np.int32), t2["pos_end"].astype(np.int32),
    )


@pytest.fixture(scope="module")
def host_counts(genome):
    from sequila_tpu.ops.host_join import make_host_index

    lk, ls, le, rk, rs, re = genome
    return make_host_index(lk, ls, le), None


def test_full_scale_bits_equals_host(genome, host_counts):
    """2.35M x 7.68M: the fused device BITS count must equal the host C++
    BITS count exactly (~99M pairs)."""
    from sequila_tpu.ops.interval_index import _bucket
    from sequila_tpu.ops.interval_join import counts_bits_fused

    lk, ls, le, rk, rs, re = genome
    hidx, _ = host_counts
    want = int(hidx.counts(rk, rs, re).sum())
    assert want > 50_000_000

    ident = jnp.arange(25, dtype=jnp.int32)
    packed = np.asarray(
        counts_bits_fused(
            jnp.asarray(lk), jnp.asarray(ls), jnp.asarray(le),
            jnp.asarray(rk), jnp.asarray(rs), jnp.asarray(re),
            ident, ident,
            n_pad=_bucket(len(lk), minimum=1024),
            m_pad=_bucket(len(rk), minimum=1024),
        )
    ).astype(np.int64)
    got, n_deg = int(packed[:-1].sum()), int(packed[-1])
    assert n_deg == 0
    assert got == want


def test_sampled_three_way_per_probe_counts(genome, host_counts, rng):
    """Per-probe counts on a 200k-row sample: level path == device BITS
    == host C++, row for row, against the FULL 2.35M-row index."""
    from sequila_tpu.ops.interval_index import (
        PAD_KEY, PAD_VAL, _bucket, build_interval_index,
    )
    from sequila_tpu.ops.interval_join import count_matches

    lk, ls, le, rk, rs, re = genome
    hidx, _ = host_counts
    sample = rng.choice(len(rk), 200_000, replace=False)
    sk, ss, se = rk[sample], rs[sample], re[sample]
    host = hidx.counts(sk, ss, se).astype(np.int64)

    idx = build_interval_index(lk, ls, le)
    cap = _bucket(len(sk), minimum=1024)
    k = np.full(cap, PAD_KEY, np.int32)
    s = np.full(cap, PAD_VAL, np.int32)
    e = np.full(cap, PAD_VAL - 2, np.int32)
    k[: len(sk)], s[: len(sk)], e[: len(sk)] = sk, ss, se
    qk, qs, qe = jnp.asarray(k), jnp.asarray(s), jnp.asarray(e)
    lvl = np.asarray(count_matches(idx, qk, qs, qe, "sort"))[: len(sk)].astype(np.int64)
    bits = np.asarray(count_matches(idx, qk, qs, qe, "bits"))[: len(sk)].astype(np.int64)
    np.testing.assert_array_equal(lvl, host)
    np.testing.assert_array_equal(bits, host)


def test_sampled_pair_parity_vs_bruteforce(genome, rng):
    """Materialized pairs for 500 sampled probe rows against the full
    2.35M-row build side == brute-force oracle."""
    from sequila_tpu.ops.interval_index import (
        PAD_KEY, PAD_VAL, _bucket, build_interval_index,
    )
    from sequila_tpu.ops.interval_join import materialize_pairs

    lk, ls, le, rk, rs, re = genome
    sample = np.sort(rng.choice(len(rk), 500, replace=False))
    sk, ss, se = rk[sample], rs[sample], re[sample]

    idx = build_interval_index(lk, ls, le)
    cap = _bucket(len(sk), minimum=1024)
    k = np.full(cap, PAD_KEY, np.int32)
    s = np.full(cap, PAD_VAL, np.int32)
    e = np.full(cap, PAD_VAL - 2, np.int32)
    k[: len(sk)], s[: len(sk)], e[: len(sk)] = sk, ss, se
    b, p, total = materialize_pairs(
        idx, jnp.asarray(k), jnp.asarray(s), jnp.asarray(e), "sort"
    )
    got = sorted(zip(p.tolist(), b.tolist()))

    lk64 = lk.astype(np.int64)
    want = []
    for i in range(len(sk)):
        mask = (lk == sk[i]) & (ls <= se[i]) & (le >= ss[i])
        want.extend((i, int(j)) for j in np.nonzero(mask)[0])
    assert got == sorted(want)
    assert total == len(want)
