"""Mesh-sharded ScanContext descriptor bank search.

The BASELINE.json north star: loop-candidate search cost must stay flat as
the bank grows by scaling chips/hosts.  The bank (N, R, S) shards along the
keyframe axis; a query descriptor is replicated; each shard runs the batched
all-shift correlation (ops/scancontext.py) over its slice and the global
best is reduced with one tiny all_gather — the reference's KD-tree +
per-candidate loop (Scancontext.cpp:331-422) becomes
  shard-local MXU correlation  +  O(devices) gather.
"""

from __future__ import annotations

import functools


import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from navtech_radar_slam_tpu.config import ScanContextConfig
from navtech_radar_slam_tpu.ops import scancontext as sc_ops
from navtech_radar_slam_tpu.parallel.mesh import BANK_AXIS


def _local_search(
    query: jnp.ndarray,
    bank_shard: jnp.ndarray,
    num_valid: jnp.ndarray,
    cfg: ScanContextConfig,
    axis: str,
):
    """Per-shard best candidate; returns replicated global best.

    Runs inside shard_map: bank_shard is this device's (N/d, R, S) slice."""
    n_local = bank_shard.shape[0]
    shard_id = jax.lax.axis_index(axis)
    base = shard_id * n_local

    dist, shift = sc_ops.sc_distance_all_shifts(query, bank_shard)
    gidx = base + jnp.arange(n_local)
    searchable = gidx < (num_valid - cfg.num_exclude_recent)
    dist = jnp.where(searchable, dist, jnp.inf)
    j = jnp.argmin(dist)
    local = jnp.stack(
        [dist[j], gidx[j].astype(jnp.float32), shift[j].astype(jnp.float32)]
    )

    allbest = jax.lax.all_gather(local, axis)          # (d, 3) replicated
    k = jnp.argmin(allbest[:, 0])
    return allbest[k]


def make_sharded_loop_detector(mesh: Mesh, cfg: ScanContextConfig,
                               axis: str = BANK_AXIS):
    """Returns jitted (query (R,S), bank (N,R,S) sharded, num_valid ()) ->
    LoopCandidate with the same semantics as ops.scancontext.detect_loop."""

    fn = shard_map(
        functools.partial(_local_search, cfg=cfg, axis=axis),
        mesh=mesh,
        in_specs=(P(), P(axis), P()),
        out_specs=P(),
        check_vma=False,
    )

    def detect(query, bank, num_valid):
        best = fn(query, bank, num_valid)
        best_dist = best[0]
        found = best_dist < cfg.sc_dist_thres
        idx = best[1].astype(jnp.int32)
        return sc_ops.LoopCandidate(
            idx=jnp.where(found, idx, -1),
            dist=best_dist,
            yaw=sc_ops.shift_to_yaw(best[2].astype(jnp.int32), cfg),
            found=found,
        )

    return jax.jit(detect)
