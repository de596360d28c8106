"""Robust SE(3) pose-graph optimization, TPU-native.

Reproduces the capability of the reference's GTSAM iSAM2 back-end
(laserPosegraphOptimization.cpp:84-96, 147-173, 291-302): a pose graph with

  * a gauge-fixing prior on node 0 (variance 1e-12, lines 149-151 — here the
    node-0 update is *frozen exactly* instead of whitened by 1e6, which would
    wreck f32 conditioning; same fixed-gauge semantics);
  * odometry Between factors (sigma 1e-3 rot / 1e-2 trans, lines 153-156);
  * loop Between factors under a Cauchy robust kernel (score 0.5, Cauchy(1),
    lines 158-163);
  * GPS position factors, altitude-dominated (xy variance 1e9, alt 250,
    Cauchy, lines 165-171).

TPU-first solver design — the iSAM2 incremental Bayes tree is a pointer-heavy
CPU structure; the equivalent capability here is **warm-started robust
Gauss-Newton re-solved per keyframe**:

  * residuals of ALL factors evaluate batched (vmapped se3 log-maps);
  * the GN normal equations H δ = -g are solved matrix-free by conjugate
    gradients where H v = Jᵀ(J v) is computed by one jvp + one vjp through
    the residual function — no Jacobian is ever materialized, every CG
    iteration is a handful of fused batched ops, and the same matvec
    shards over a device mesh for the distributed graph (parallel/);
  * robustness via IRLS: Cauchy weights recomputed each outer iteration
    (fixed iteration counts, masked convergence — XLA-friendly);
  * Levenberg damping on the CG system for far-from-convergence safety.

Because each keyframe's solve warm-starts from the previous estimate, the
per-keyframe cost behaves like iSAM2's incremental update while remaining a
single statically-shaped compiled program.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from navtech_radar_slam_tpu.config import PgoConfig
from navtech_radar_slam_tpu.utils import geometry as geo


class GraphArrays(NamedTuple):
    """Padded, statically-shaped pose-graph state (device-resident)."""

    poses: jnp.ndarray        # (N, 4, 4) current estimates
    num_nodes: jnp.ndarray    # () int32
    odom_meas: jnp.ndarray    # (N, 4, 4) measurement T_{k-1,k} stored at k
    odom_valid: jnp.ndarray   # (N,) bool (slot 0 unused)
    loop_i: jnp.ndarray       # (L,) int32 earlier node
    loop_j: jnp.ndarray       # (L,) int32 later node
    loop_meas: jnp.ndarray    # (L, 4, 4) T_{i,j} from ICP
    loop_valid: jnp.ndarray   # (L,) bool
    gps_meas: jnp.ndarray     # (N, 3) world-frame position measurement
    gps_valid: jnp.ndarray    # (N,) bool


def empty_graph(cfg: PgoConfig, dtype=jnp.float32) -> GraphArrays:
    N, L = cfg.max_nodes, cfg.max_loop_edges
    eye = jnp.broadcast_to(jnp.eye(4, dtype=dtype), (N, 4, 4))
    return GraphArrays(
        poses=eye,
        num_nodes=jnp.asarray(0, jnp.int32),
        odom_meas=eye,
        odom_valid=jnp.zeros((N,), bool),
        loop_i=jnp.zeros((L,), jnp.int32),
        loop_j=jnp.zeros((L,), jnp.int32),
        loop_meas=jnp.broadcast_to(jnp.eye(4, dtype=dtype), (L, 4, 4)),
        loop_valid=jnp.zeros((L,), bool),
        gps_meas=jnp.zeros((N, 3), dtype),
        gps_valid=jnp.zeros((N,), bool),
    )


# ---------------------------------------------------------------------------
# residuals
# ---------------------------------------------------------------------------

def _between_residual(Ti, Tj, meas):
    """r = log(meas^{-1} Ti^{-1} Tj) ∈ R^6 (gtsam BetweenFactor error)."""
    return geo.se3_log(geo.se3_mul(geo.se3_inv(meas), geo.se3_between(Ti, Tj)))


def _between_residual_masked(Ti, Tj, meas, valid):
    """Between residual with the relative transform forced to identity for
    invalid (padding) factors BEFORE the log map.

    Masking after the log is not enough: a padding slot can pair an
    arbitrary pose with the identity, landing the log on a pi-rotation
    where its backward pass is singular — and 0 * NaN = NaN would poison
    the whole gradient."""
    rel = geo.se3_mul(geo.se3_inv(meas), geo.se3_between(Ti, Tj))
    rel = jnp.where(valid, rel, jnp.eye(4, dtype=rel.dtype))
    return geo.se3_log(rel)


def _apply_delta(poses, delta):
    """Right-perturbation update: T <- T exp(delta)."""
    return geo.se3_mul(poses, geo.se3_exp(delta))


def _whiten_between(r, sigma_rot, sigma_trans):
    s = jnp.concatenate(
        [jnp.full((3,), 1.0 / sigma_trans), jnp.full((3,), 1.0 / sigma_rot)]
    )
    return r * s


def residuals(
    delta: jnp.ndarray,
    g: GraphArrays,
    loop_irls_w: jnp.ndarray,
    gps_irls_w: jnp.ndarray,
    cfg: PgoConfig,
) -> jnp.ndarray:
    """All whitened factor residuals as one flat vector; delta (N, 6) is the
    tangent update being linearized (0 at the linearization point).

    Node 0 is the gauge: its delta is zeroed (exact prior)."""
    N = g.poses.shape[0]
    idx = jnp.arange(N)
    delta = jnp.where((idx == 0)[:, None], 0.0, delta)
    P = _apply_delta(g.poses, delta)

    # odometry chain factors: node k vs k-1
    Pi = jnp.roll(P, 1, axis=0)
    r_odom = jax.vmap(_between_residual_masked)(Pi, P, g.odom_meas, g.odom_valid)
    r_odom = jax.vmap(
        functools.partial(
            _whiten_between,
            sigma_rot=cfg.odom_sigma_rot,
            sigma_trans=cfg.odom_sigma_trans,
        )
    )(r_odom)
    r_odom = r_odom * g.odom_valid[:, None]

    # loop factors (IRLS-weighted Cauchy)
    Li = P[g.loop_i]
    Lj = P[g.loop_j]
    r_loop = jax.vmap(_between_residual_masked)(Li, Lj, g.loop_meas, g.loop_valid)
    r_loop = r_loop / cfg.loop_sigma
    r_loop = r_loop * (g.loop_valid * jnp.sqrt(loop_irls_w))[:, None]

    # GPS position factors (altitude-dominated by the sigma pattern)
    t = P[:, :3, 3]
    s = jnp.asarray(
        [1.0 / cfg.gps_sigma_xy, 1.0 / cfg.gps_sigma_xy, 1.0 / cfg.gps_sigma_alt]
    )
    r_gps = (t - g.gps_meas) * s
    r_gps = r_gps * (g.gps_valid * jnp.sqrt(gps_irls_w))[:, None]

    return jnp.concatenate([r_odom.reshape(-1), r_loop.reshape(-1), r_gps.reshape(-1)])


# ---------------------------------------------------------------------------
# solver
# ---------------------------------------------------------------------------

def _cg_solve(matvec, b, precond, iters: int, tol: float):
    """Preconditioned CG on H x = b with an early-exit while_loop.

    f32 note: the whitened normal equations have condition ~1e6+ (odometry
    whitening 1e3 vs loop whitening 2); unpreconditioned CG stalls in f32,
    the diagonal preconditioner restores convergence.

    A lax.while_loop (not scan): warm-started per-keyframe solves converge
    in a handful of iterations, and unlike a masked scan the while_loop
    actually stops paying for the remainder — measured 612 -> ~150 ms for
    the full solve on a 300-node/175-loop v5e graph.  Nothing
    differentiates through the solver, so while_loop's non-reversibility
    is free."""
    x0 = jnp.zeros_like(b)
    r0 = b
    z0 = precond(r0)
    p0 = z0
    rz0 = jnp.vdot(r0, z0)
    b2 = jnp.maximum(jnp.vdot(b, b), 1e-30)

    def cond(carry):
        _, r, _, _, it = carry
        return (it < iters) & (jnp.vdot(r, r) / b2 >= tol * tol)

    def body(carry):
        x, r, p, rz, it = carry
        Hp = matvec(p)
        alpha = rz / jnp.maximum(jnp.vdot(p, Hp), 1e-30)
        x1 = x + alpha * p
        r1 = r - alpha * Hp
        z1 = precond(r1)
        rz1 = jnp.vdot(r1, z1)
        beta = rz1 / jnp.maximum(rz, 1e-30)
        p1 = z1 + beta * p
        return (x1, r1, p1, rz1, it + 1)

    (x, _, _, _, _) = jax.lax.while_loop(
        cond, body, (x0, r0, p0, rz0, jnp.asarray(0, jnp.int32))
    )
    return x


def _diag_precond(g: GraphArrays, loop_w, gps_w, cfg: PgoConfig, lam: float):
    """Analytic approximation of diag(JᵀJ): each factor contributes its
    squared whitening to the diagonal blocks of both endpoint nodes (the
    between-factor Jacobians are ~orthonormal in the tangent basis)."""
    N = g.poses.shape[0]
    s_odom = jnp.concatenate(
        [
            jnp.full((3,), 1.0 / cfg.odom_sigma_trans**2),
            jnp.full((3,), 1.0 / cfg.odom_sigma_rot**2),
        ]
    )
    d = jnp.zeros((N, 6))
    ov = g.odom_valid.astype(jnp.float32)[:, None]
    d = d + ov * s_odom[None, :]                       # factor k touches node k
    d = d + jnp.roll(ov, -1, axis=0) * s_odom[None, :]  # and node k-1

    s_loop = (1.0 / cfg.loop_sigma**2) * (g.loop_valid * loop_w)
    d = d.at[g.loop_i].add(s_loop[:, None] * jnp.ones((1, 6)))
    d = d.at[g.loop_j].add(s_loop[:, None] * jnp.ones((1, 6)))

    s_gps = jnp.asarray(
        [1.0 / cfg.gps_sigma_xy**2, 1.0 / cfg.gps_sigma_xy**2,
         1.0 / cfg.gps_sigma_alt**2, 0.0, 0.0, 0.0]
    )
    d = d + (g.gps_valid * gps_w)[:, None] * s_gps[None, :]

    d = d + lam
    dinv = (1.0 / jnp.maximum(d, 1e-12)).reshape(-1)
    return lambda v: dinv * v


def _chain_precond(g: GraphArrays, cfg: PgoConfig, lam: float):
    """Exact inverse of the odometry-chain part of the normal equations.

    In edge coordinates u_k = x_k - x_{k-1} (tangent-space differences) the
    chain Hessian is diagonal: H_chain = Tᵀ⁻¹ diag(W) T⁻¹ with x = T u and
    T the block prefix-sum operator.  Hence M⁻¹ r = T diag(W)⁻¹ Tᵀ r — a
    suffix sum, a per-edge scale, and a prefix sum (two log-depth cumsums).

    Jacobi preconditioning propagates a loop-closure correction ONE node per
    CG iteration along the chain (tridiagonal systems are CG's worst case);
    this preconditioner propagates it across the whole graph per iteration,
    so CG converges in roughly O(#loop factors) iterations independent of
    chain length.  The rotation-translation coupling (between-factor
    adjoints) is ignored — a preconditioner only needs to be SPD and close.

    The gauge (node 0) gets zero edge weight, pinning delta_0 = 0 exactly
    (matching the residuals' hard gauge freeze).

    Invalid (padding / session-gap) edges get the SAME weight as valid ones
    rather than the bare damping lam: with winv = 1/lam (~1e6) the cumsums
    would amplify padded-coordinate noise by ~1e10 relative to the valid
    scale — empirically benign at lam=1e-6 but fragile as lm_lambda0 or the
    capacity changes.  A preconditioner only needs to be SPD and close, so
    over-weighting dead edges (whose residuals are exactly zero) is safe."""
    N = g.poses.shape[0]
    s_odom = jnp.concatenate(
        [
            jnp.full((3,), 1.0 / cfg.odom_sigma_trans**2),
            jnp.full((3,), 1.0 / cfg.odom_sigma_rot**2),
        ]
    )
    w = jnp.broadcast_to(s_odom[None, :], (N, 6)) + lam
    winv = 1.0 / w
    winv = winv.at[0].set(0.0)   # gauge: u_0 = x_0 frozen at 0

    def apply(r):
        rd = r.reshape(N, 6)
        a = jnp.cumsum(rd[::-1], axis=0)[::-1]   # Tᵀ r  (suffix sums)
        b = a * winv                             # diag(W)⁻¹
        z = jnp.cumsum(b, axis=0)                # T b   (prefix sums)
        return z.reshape(-1)

    return apply


def _gn_step(g: GraphArrays, cfg: PgoConfig, lam: float) -> GraphArrays:
    """One IRLS + damped GN step: recompute robust weights, solve normal
    equations by CG through jvp/vjp matvecs, apply the tangent update."""
    N = g.poses.shape[0]
    zero = jnp.zeros((N, 6), g.poses.dtype)

    # IRLS weights from current (unweighted) robust-factor residuals
    r_loop_raw = jax.vmap(_between_residual_masked)(
        g.poses[g.loop_i], g.poses[g.loop_j], g.loop_meas, g.loop_valid
    ) / cfg.loop_sigma
    loop_r2 = jnp.sum(r_loop_raw * r_loop_raw, axis=-1)
    loop_w = 1.0 / (1.0 + loop_r2 / (cfg.loop_cauchy_k**2))

    t = g.poses[:, :3, 3]
    s = jnp.asarray(
        [1.0 / cfg.gps_sigma_xy, 1.0 / cfg.gps_sigma_xy, 1.0 / cfg.gps_sigma_alt]
    )
    gps_r2 = jnp.sum(((t - g.gps_meas) * s) ** 2, axis=-1)
    gps_w = 1.0 / (1.0 + gps_r2 / (cfg.gps_cauchy_k**2))

    rfun = lambda d: residuals(d, g, loop_w, gps_w, cfg)
    r0, vjp = jax.vjp(rfun, zero)

    def matvec(v):
        vd = v.reshape(N, 6)
        _, Jv = jax.jvp(rfun, (zero,), (vd,))
        JtJv = vjp(Jv)[0].reshape(-1)
        return JtJv + lam * v

    (g_vec,) = vjp(r0)
    b = -g_vec.reshape(-1)
    if cfg.preconditioner == "chain":
        precond = _chain_precond(g, cfg, lam)
    else:
        precond = _diag_precond(g, loop_w, gps_w, cfg, lam)
    delta = _cg_solve(matvec, b, precond, cfg.cg_iters, cfg.cg_tol).reshape(N, 6)

    idx = jnp.arange(N)
    active = (idx > 0) & (idx < g.num_nodes)
    delta = jnp.where(active[:, None], delta, 0.0)
    return g._replace(poses=_apply_delta(g.poses, delta)), jnp.max(jnp.abs(delta))


def solve(g: GraphArrays, cfg: PgoConfig) -> GraphArrays:
    """Full robust solve: up to cfg.gn_iters outer IRLS/GN iterations,
    exiting early once the applied tangent step falls below gn_step_tol
    (warm-started re-solves on an unchanged factor set converge in one or
    two iterations — the while_loop stops paying for the rest)."""

    def cond(carry):
        _, it, step = carry
        return (it < cfg.gn_iters) & (step >= _GN_STEP_TOL)

    def body(carry):
        gg, it, _ = carry
        gg, step = _gn_step(gg, cfg, cfg.lm_lambda0)
        return (gg, it + 1, step)

    g, _, _ = jax.lax.while_loop(
        cond, body, (g, jnp.asarray(0, jnp.int32), jnp.asarray(jnp.inf))
    )
    return g


#: outer GN exit: stop once no pose moved more than this (tangent units,
#: m / rad) — far below both the odometry noise floor and any test bound
_GN_STEP_TOL = 1e-5


def make_solver(cfg: PgoConfig):
    return jax.jit(functools.partial(solve, cfg=cfg))


def make_bucketed_solver(cfg: PgoConfig):
    """Solver that runs on the smallest power-of-two *prefix* of the padded
    arrays that holds the active graph.

    The padded capacity (max_nodes, default 4096) is a growth bound, not the
    working size; solving at full padding made every per-keyframe refine pay
    the 4096-node cost (measured 259 ms for a 512-node graph on v5e).  Each
    bucket size compiles once (log2(capacity) buckets over a run) and the
    write-back touches only the solved prefix.

    Returns ``solver(g, num_nodes, num_loops) -> GraphArrays`` (host ints;
    the counts select the bucket, the solve itself stays fully jitted)."""
    cache = {}

    def solver(g: GraphArrays, num_nodes: int, num_loops: int) -> GraphArrays:
        N = g.poses.shape[0]
        L = g.loop_i.shape[0]
        nb = min(N, max(64, 1 << (max(int(num_nodes), 1) - 1).bit_length()))
        # loops stay at full padding: their residual cost is negligible
        # (L small 4x4 log-maps) and bucketing them would recompile the
        # solver every time the loop count crosses a power of two
        lb = L
        key = (nb, lb, N, L)
        if key not in cache:

            def run(g: GraphArrays) -> GraphArrays:
                gs = GraphArrays(
                    poses=g.poses[:nb],
                    num_nodes=g.num_nodes,
                    odom_meas=g.odom_meas[:nb],
                    odom_valid=g.odom_valid[:nb],
                    loop_i=g.loop_i[:lb],
                    loop_j=g.loop_j[:lb],
                    loop_meas=g.loop_meas[:lb],
                    loop_valid=g.loop_valid[:lb],
                    gps_meas=g.gps_meas[:nb],
                    gps_valid=g.gps_valid[:nb],
                )
                gs = solve(gs, cfg)
                return g._replace(poses=g.poses.at[:nb].set(gs.poses))

            cache[key] = jax.jit(run)
        return cache[key](g)

    return solver


# ---------------------------------------------------------------------------
# host-side graph builder
# ---------------------------------------------------------------------------

class PoseGraph:
    """Host wrapper: accumulates factors into padded arrays, re-solves
    incrementally (warm-started) like the reference's per-keyframe
    runISAM2opt (laserPosegraphOptimization.cpp:291-302)."""

    def __init__(self, cfg: PgoConfig):
        self.cfg = cfg
        self.g = empty_graph(cfg)
        self._solve = make_bucketed_solver(cfg)
        self.num_nodes = 0
        self.num_loops = 0

    def grow(self, new_max_nodes: int = None, new_max_loops: int = None):
        """Double (or set) capacities, padding arrays and rebuilding the
        jitted solver — host-level capacity doubling so the padded static
        shapes stay XLA-friendly while the graph is unbounded in practice."""
        import dataclasses

        new_max_nodes = new_max_nodes or 2 * self.cfg.max_nodes
        new_max_loops = new_max_loops or 2 * self.cfg.max_loop_edges
        old = self.g
        self.cfg = dataclasses.replace(
            self.cfg, max_nodes=new_max_nodes, max_loop_edges=new_max_loops,
        )
        g = empty_graph(self.cfg)
        N0 = old.poses.shape[0]
        L0 = old.loop_i.shape[0]
        self.g = g._replace(
            poses=g.poses.at[:N0].set(old.poses),
            num_nodes=old.num_nodes,
            odom_meas=g.odom_meas.at[:N0].set(old.odom_meas),
            odom_valid=g.odom_valid.at[:N0].set(old.odom_valid),
            loop_i=g.loop_i.at[:L0].set(old.loop_i),
            loop_j=g.loop_j.at[:L0].set(old.loop_j),
            loop_meas=g.loop_meas.at[:L0].set(old.loop_meas),
            loop_valid=g.loop_valid.at[:L0].set(old.loop_valid),
            gps_meas=g.gps_meas.at[:N0].set(old.gps_meas),
            gps_valid=g.gps_valid.at[:N0].set(old.gps_valid),
        )
        self._solve = make_bucketed_solver(self.cfg)

    def add_node(self, pose_init: np.ndarray, odom_meas: np.ndarray = None):
        """Append node with initial SE(3) pose; odom_meas is T_{prev,this}
        (None for the first node, which becomes the gauge/prior)."""
        k = self.num_nodes
        if k >= self.cfg.max_nodes:
            raise RuntimeError("pose graph capacity exceeded; raise max_nodes")
        self.g = self.g._replace(
            poses=self.g.poses.at[k].set(jnp.asarray(pose_init)),
            num_nodes=jnp.asarray(k + 1, jnp.int32),
        )
        if odom_meas is not None and k > 0:
            self.g = self.g._replace(
                odom_meas=self.g.odom_meas.at[k].set(jnp.asarray(odom_meas)),
                odom_valid=self.g.odom_valid.at[k].set(True),
            )
        self.num_nodes = k + 1
        return k

    def add_loop(self, i: int, j: int, meas: np.ndarray):
        l = self.num_loops
        if l >= self.cfg.max_loop_edges:
            raise RuntimeError("loop edge capacity exceeded; raise max_loop_edges")
        self.g = self.g._replace(
            loop_i=self.g.loop_i.at[l].set(i),
            loop_j=self.g.loop_j.at[l].set(j),
            loop_meas=self.g.loop_meas.at[l].set(jnp.asarray(meas)),
            loop_valid=self.g.loop_valid.at[l].set(True),
        )
        self.num_loops = l + 1

    def add_gps(self, node: int, xyz: np.ndarray):
        self.g = self.g._replace(
            gps_meas=self.g.gps_meas.at[node].set(jnp.asarray(xyz)),
            gps_valid=self.g.gps_valid.at[node].set(True),
        )

    def optimize(self):
        self.g = self._solve(self.g, self.num_nodes, self.num_loops)

    def poses(self) -> np.ndarray:
        # fetch the FULL padded array and slice on host: a device-side
        # [:num_nodes] slice has a different shape every call, compiling a
        # fresh program per snapshot over the tunneled backend (~0.5 s per
        # live-path poll); the padded fetch is one round trip + ~256 KB
        return np.asarray(jax.device_get(self.g.poses))[: self.num_nodes]
