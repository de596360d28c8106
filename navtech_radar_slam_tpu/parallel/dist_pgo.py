"""Distributed pose-graph Gauss-Newton over a device mesh.

The Schur-complement story from SURVEY §7 / BASELINE.json realized the
matvec-free way: the GN normal-equation matvec  H v = Jᵀ(J v)  decomposes
over *factors*, so each device evaluates the jvp/vjp through its own slice
of the odometry/GPS factors (sharded along the node axis) and one `psum`
reduces the partial matvecs.  Poses and the (few) loop factors are
replicated; CG runs replicated on every device — its state is O(N·6),
trivial next to the factor work.  The same program runs on 1 chip, 8 chips,
or a multi-host slice: only the mesh changes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from navtech_radar_slam_tpu.config import PgoConfig
from navtech_radar_slam_tpu.models.posegraph import (
    GraphArrays,
    _between_residual_masked,
    _apply_delta,
    _cg_solve,
)
from navtech_radar_slam_tpu.utils import geometry as geo


def _local_residuals(
    delta,
    poses,
    num_nodes,
    odom_meas_sh,
    odom_valid_sh,
    loop_i,
    loop_j,
    loop_meas,
    loop_valid,
    gps_meas_sh,
    gps_valid_sh,
    loop_w,
    gps_w_sh,
    cfg: PgoConfig,
    axis: str,
):
    """Whitened residuals of THIS shard's factors (flat vector).

    Shard-local arrays carry a leading N/d dimension; delta and poses are
    replicated; loops are evaluated only on shard 0 (masked elsewhere)."""
    N = poses.shape[0]
    ns = odom_meas_sh.shape[0]
    shard = jax.lax.axis_index(axis)
    base = shard * ns

    idx = jnp.arange(N)
    delta = jnp.where((idx == 0)[:, None], 0.0, delta)
    Pu = _apply_delta(poses, delta)

    # odometry factors for global edges [base, base+ns): need Pu[base-1 .. )
    gidx = base + jnp.arange(ns)
    prev = jnp.clip(gidx - 1, 0, N - 1)
    r_odom = jax.vmap(_between_residual_masked)(
        Pu[prev], Pu[gidx], odom_meas_sh, odom_valid_sh
    )
    s_odom = jnp.concatenate(
        [jnp.full((3,), 1.0 / cfg.odom_sigma_trans),
         jnp.full((3,), 1.0 / cfg.odom_sigma_rot)]
    )
    r_odom = r_odom * s_odom[None, :] * odom_valid_sh[:, None]

    # loop factors: replicated, evaluated once (shard 0)
    on0 = (shard == 0).astype(jnp.float32)
    r_loop = jax.vmap(_between_residual_masked)(
        Pu[loop_i], Pu[loop_j], loop_meas, loop_valid
    )
    r_loop = (
        r_loop / cfg.loop_sigma
        * (loop_valid * jnp.sqrt(loop_w))[:, None] * on0
    )

    # GPS factors on this shard's nodes
    t = Pu[gidx][:, :3, 3]
    s_gps = jnp.asarray(
        [1.0 / cfg.gps_sigma_xy, 1.0 / cfg.gps_sigma_xy, 1.0 / cfg.gps_sigma_alt]
    )
    r_gps = (t - gps_meas_sh) * s_gps
    r_gps = r_gps * (gps_valid_sh * jnp.sqrt(gps_w_sh))[:, None]

    return jnp.concatenate(
        [r_odom.reshape(-1), r_loop.reshape(-1), r_gps.reshape(-1)]
    )


def _sharded_gn_step(
    poses, num_nodes,
    odom_meas_sh, odom_valid_sh,
    loop_i, loop_j, loop_meas, loop_valid,
    gps_meas_sh, gps_valid_sh,
    cfg: PgoConfig, axis: str, lam: float,
):
    """One IRLS+GN step, executed inside shard_map."""
    N = poses.shape[0]
    zero = jnp.zeros((N, 6), poses.dtype)

    # IRLS weights (loops replicated; gps local)
    r_loop_raw = jax.vmap(_between_residual_masked)(
        poses[loop_i], poses[loop_j], loop_meas, loop_valid
    ) / cfg.loop_sigma
    loop_w = 1.0 / (1.0 + jnp.sum(r_loop_raw**2, -1) / cfg.loop_cauchy_k**2)
    t = poses[jnp.arange(odom_meas_sh.shape[0]) +
              jax.lax.axis_index(axis) * odom_meas_sh.shape[0]][:, :3, 3]
    s_gps = jnp.asarray(
        [1.0 / cfg.gps_sigma_xy, 1.0 / cfg.gps_sigma_xy, 1.0 / cfg.gps_sigma_alt]
    )
    gps_r2 = jnp.sum(((t - gps_meas_sh) * s_gps) ** 2, -1)
    gps_w_sh = 1.0 / (1.0 + gps_r2 / cfg.gps_cauchy_k**2)

    rfun = lambda d: _local_residuals(
        d, poses, num_nodes, odom_meas_sh, odom_valid_sh,
        loop_i, loop_j, loop_meas, loop_valid,
        gps_meas_sh, gps_valid_sh, loop_w, gps_w_sh, cfg, axis,
    )
    r0, vjp = jax.vjp(rfun, zero)

    def matvec(v):
        vd = v.reshape(N, 6)
        _, Jv = jax.jvp(rfun, (zero,), (vd,))
        local = vjp(Jv)[0].reshape(-1)
        return jax.lax.psum(local, axis) + lam * v

    (g_local,) = vjp(r0)
    b = -jax.lax.psum(g_local.reshape(-1), axis)

    s2 = jnp.concatenate(
        [jnp.full((3,), 1.0 / cfg.odom_sigma_trans**2),
         jnp.full((3,), 1.0 / cfg.odom_sigma_rot**2)]
    )
    if cfg.preconditioner == "chain":
        # chain preconditioner (see models.posegraph._chain_precond): CG
        # state is replicated, so each device applies the same two cumsums
        # locally; only the odometry validity needs one (N,)-bool all_gather
        ov = jax.lax.all_gather(odom_valid_sh, axis, tiled=True)
        w = ov.astype(jnp.float32)[:, None] * s2[None, :] + lam
        winv = (1.0 / w).at[0].set(0.0)

        def precond(v):
            rd = v.reshape(N, 6)
            a = jnp.cumsum(rd[::-1], axis=0)[::-1]
            z = jnp.cumsum(a * winv, axis=0)
            return z.reshape(-1)
    else:
        # cheap replicated Jacobi: odometry-dominated diagonal
        dinv = 1.0 / (2.0 * jnp.tile(s2, (N,)) + lam)
        precond = lambda v: dinv * v

    delta = _cg_solve(matvec, b, precond, cfg.cg_iters, cfg.cg_tol).reshape(N, 6)
    idx = jnp.arange(N)
    active = (idx > 0) & (idx < num_nodes)
    delta = jnp.where(active[:, None], delta, 0.0)
    return _apply_delta(poses, delta)


def make_distributed_solver(mesh: Mesh, cfg: PgoConfig, axis: str = "bank"):
    """Jitted sharded solve: GraphArrays -> updated poses.

    Expects odom_meas/odom_valid/gps_meas/gps_valid device-sharded along the
    node axis and everything else replicated (see tests/test_parallel.py and
    __graft_entry__.dryrun_multichip)."""

    step = shard_map(
        functools.partial(_sharded_gn_step, cfg=cfg, axis=axis,
                          lam=cfg.lm_lambda0),
        mesh=mesh,
        in_specs=(
            P(), P(),              # poses, num_nodes
            P(axis), P(axis),      # odom shards
            P(), P(), P(), P(),    # loops replicated
            P(axis), P(axis),      # gps shards
        ),
        out_specs=P(),
        check_vma=False,
    )

    def solve(g: GraphArrays) -> jnp.ndarray:
        poses = g.poses
        for _ in range(cfg.gn_iters):
            poses = step(
                poses, g.num_nodes, g.odom_meas, g.odom_valid,
                g.loop_i, g.loop_j, g.loop_meas, g.loop_valid,
                g.gps_meas, g.gps_valid,
            )
        return poses

    return jax.jit(solve)
