"""Drive skew_partitioned_nearest end-to-end on the REAL TPU chip.

The SQL layer can't route skew on a 1-chip mesh (npart<=1 falls back to
hash by design), so this drives the skew kernel directly on a 1-device
mesh — fringe replication, crossing-probe host fallback, and the device
nearest kernel all execute on real hardware — and cross-checks against
the canonical oracle and the hash-partitioned path.
"""
import numpy as np
import jax

print("devices:", jax.devices())
assert "TPU" in str(jax.devices()[0]).upper() or "lite" in str(jax.devices()[0])

from sequila_tpu.ops.oracle import oracle_nearest_canonical
from sequila_tpu.parallel.mesh import make_mesh
from sequila_tpu.parallel.partitioned_join import partitioned_nearest
from sequila_tpu.parallel.skew import (
    assign_probe_nearest,
    plan_partitions,
    skew_partitioned_nearest,
)

rng = np.random.default_rng(42)
n, m = 400, 900
lk = np.where(rng.random(n) < 0.9, 0, rng.integers(1, 5, n)).astype(np.int32)
ls = rng.integers(0, 60_000, n).astype(np.int32)
le = ls + rng.integers(0, 700, n).astype(np.int32)
rk = np.where(rng.random(m) < 0.9, 0, rng.integers(1, 6, m)).astype(np.int32)
rs = rng.integers(0, 60_000, m).astype(np.int32)
long = rng.random(m) < 0.3
re = rs + np.where(long, rng.integers(10_000, 50_000, m), rng.integers(0, 300, m)).astype(np.int32)

mesh = make_mesh(1, part=1)
plan = plan_partitions(lk, rk, rs, npart=4)
_, _, crossing = assign_probe_nearest(plan, rk, rs, re)
print("hot split:", 0 in plan.splits, "crossing probes:", len(crossing))

want = oracle_nearest_canonical(lk, ls, le, rk, rs, re)
got = skew_partitioned_nearest(mesh, lk, ls, le, rk, rs, re)
np.testing.assert_array_equal(got, want)
print("skew == canonical oracle: OK")

hash_rows = partitioned_nearest(mesh, lk, ls, le, rk, rs, re)
np.testing.assert_array_equal(hash_rows, want)
print("hash == canonical oracle: OK")
print("DRIVE PASSED")
