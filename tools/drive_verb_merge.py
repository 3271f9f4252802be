"""Verb-layer merge backends (count_overlaps + coverage) on the real TPU."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np
import pyarrow as pa

from sequila_tpu import dataframe as gdf
from sequila_tpu.models.table import Table
from sequila_tpu.ops.pallas import merge_count as mc

print("devices:", jax.devices())


def make(n, seed, keys=24, span=120_000_000):
    r = np.random.default_rng(seed)
    s = r.integers(0, span, n).astype(np.int64)
    return Table(pa.table({
        "contig": pa.array(np.char.add("chr", (r.integers(0, keys, n) + 1).astype("U2"))),
        "pos_start": s,
        "pos_end": s + r.integers(1, 10_000, n),
    }))


a, b = make(500_000, 2), make(500_000, 1)

# force the device route (the tunnel cost model would pick host)
gdf._route_perprobe_host = lambda *x: False
assert mc.plan_verb_ranks(b, a, (0, 1, 2), (0, 1, 2), want4=True) is not None

# host oracle via the native index
from sequila_tpu.native.loader import NativeIntervalIndex  # noqa: E402

ca, _, _ = a.dict_codes(0)
cb, _, _ = b.dict_codes(0)
from sequila_tpu.models.table import merge_dictionaries  # noqa: E402

_, bvals, _ = b.dict_codes(0)
_, avals, _ = a.dict_codes(0)
rb, ra = merge_dictionaries(bvals, avals)
idx = NativeIntervalIndex(rb[cb], b.column_as_i32(1), b.column_as_i32(2))
expect_c, expect_b = idx.coverage(ra[ca], a.column_as_i32(1), a.column_as_i32(2))

out = gdf.coverage(a, b)
np.testing.assert_array_equal(out.column_np("count"), expect_c)
np.testing.assert_array_equal(out.column_np("bases"), expect_b)
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    gdf.coverage(a, b)
    ts.append(time.perf_counter() - t0)
print(f"coverage merge OK: best {min(ts)*1e3:.1f} ms "
      f"(bases sum={int(expect_b.sum()):,})")

out = gdf.count_overlaps(a, b)
np.testing.assert_array_equal(
    out.column_np("count"), idx.counts(ra[ca], a.column_as_i32(1), a.column_as_i32(2))
)
ts = []
for _ in range(5):
    t0 = time.perf_counter()
    gdf.count_overlaps(a, b)
    ts.append(time.perf_counter() - t0)
print(f"count_overlaps merge OK: best {min(ts)*1e3:.1f} ms")
print("VERB MERGE VERIFIED")
