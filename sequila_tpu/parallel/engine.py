"""Engine-facing mesh acquisition for Partitioned-mode execution.

The reference's IntervalJoinExec declares a hash-partitioned required
distribution when PartitionMode::Partitioned is selected and executes a
per-partition build (reference interval_join.rs:385-404, :459-510);
DataFusion picks partition counts from `target_partitions`.  Here the
analog is a ('part','probe') device mesh: `SET
datafusion.execution.target_partitions = N` makes the optimizer plan the
join in Partitioned mode and the operator execute its count/pairs/nearest
/per-probe-count paths as SPMD shard_map programs over this mesh
(parallel/partitioned_join.py).

On hardware with fewer chips than target_partitions the mesh shrinks to
the available devices (a 1-chip mesh still executes the partitioned
program — the degenerate single-shard case, like the reference running
Partitioned mode on one core)."""

from __future__ import annotations

import functools

import jax

from sequila_tpu.parallel.mesh import make_mesh


@functools.lru_cache(maxsize=8)
def _cached_mesh(n: int):
    return make_mesh(n)


@functools.lru_cache(maxsize=8)
def _cached_flat_mesh(n: int):
    return make_mesh(n, part=n)


def get_engine_mesh(target_partitions: int):
    """The engine's execution mesh for Partitioned mode, or None when
    single-chip execution is configured (target_partitions <= 1)."""
    if target_partitions <= 1:
        return None
    n = min(target_partitions, len(jax.devices()))
    return _cached_mesh(n)


def get_flat_mesh(mesh):
    """A 1-D ('part'=n, 'probe'=1) mesh over the same devices — the
    all_to_all shuffle exchanges over the 'part' axis only, so the flat
    layout gives it the full device count as exchange partners."""
    return _cached_flat_mesh(int(mesh.devices.size))
