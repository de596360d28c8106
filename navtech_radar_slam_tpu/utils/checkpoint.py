"""Checkpoint / resume of full SLAM state.

The reference has NO persistence — map save is an unmet TODO
(README.md:137-139) and the descriptor bank / keyframe clouds / iSAM2 state
live only in process memory (SURVEY §5.4).  Here the complete engine state
— keyframe clouds, descriptor bank, ring keys, pose-graph arrays, odometry
carry, counters, and the config that produced them — round-trips through a
single compressed npz, enabling kill-and-resume and multi-session loading
(the ScanContext multi-session API's missing other half)."""

from __future__ import annotations

import json
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from navtech_radar_slam_tpu.models.slam import SlamEngine


def save_engine(eng: "SlamEngine", path: str) -> None:
    eng.drain_chunks()          # finish any in-flight streaming chunks
    eng._flush_pending_loop()   # commit any deferred loop decision first
    g = eng.graph.g
    np.savez_compressed(
        path,
        config=json.dumps(eng.cfg.to_dict()),
        clouds=np.asarray(eng.clouds),
        clouds_valid=np.asarray(eng.clouds_valid),
        bank=np.asarray(eng.bank),
        ring_keys=np.asarray(eng.ring_keys),
        kf_times=np.asarray(eng.kf_times, np.float64),
        odom_poses=np.asarray(eng.odom_poses, np.float64).reshape(-1, 3),
        num_keyframes=eng.num_keyframes,
        movement_accum=eng.movement_accum,
        last_kf_pose=eng.last_kf_pose,
        odo_pose=eng.odometry.pose,
        odo_last_rel=eng.odometry.last_rel,
        num_scans=eng.num_scans,
        session_start=eng.session_start,
        rebased=eng._rebased,
        gps_alt_offset=(np.nan if eng.gps_alt_offset is None
                        else eng.gps_alt_offset),
        graph_poses=np.asarray(g.poses),
        graph_num_nodes=int(g.num_nodes),
        graph_odom_meas=np.asarray(g.odom_meas),
        graph_odom_valid=np.asarray(g.odom_valid),
        graph_loop_i=np.asarray(g.loop_i),
        graph_loop_j=np.asarray(g.loop_j),
        graph_loop_meas=np.asarray(g.loop_meas),
        graph_loop_valid=np.asarray(g.loop_valid),
        graph_gps_meas=np.asarray(g.gps_meas),
        graph_gps_valid=np.asarray(g.gps_valid),
        num_loops=eng.graph.num_loops,
        loop_events=np.asarray(
            [[e.prev_idx, e.curr_idx, e.sc_dist, e.icp_fitness]
             for e in eng.loops],
            np.float64,
        ).reshape(-1, 4),
    )


def load_engine(path: str) -> "SlamEngine":
    import jax.numpy as jnp

    from navtech_radar_slam_tpu.config import SlamConfig
    from navtech_radar_slam_tpu.models.slam import LoopEvent, SlamEngine

    z = np.load(path, allow_pickle=False)
    cfg = SlamConfig.from_json(str(z["config"]))
    eng = SlamEngine(cfg)

    eng.clouds = jnp.asarray(z["clouds"])
    eng.clouds_valid = jnp.asarray(z["clouds_valid"])
    eng.bank = jnp.asarray(z["bank"])
    eng.ring_keys = jnp.asarray(z["ring_keys"])
    eng.kf_times = list(z["kf_times"])
    if "odom_poses" in z:
        eng.odom_poses = [p for p in np.asarray(z["odom_poses"])]
    eng.num_keyframes = int(z["num_keyframes"])
    eng.movement_accum = float(z["movement_accum"])
    eng.last_kf_pose = np.asarray(z["last_kf_pose"])
    eng.num_scans = int(z["num_scans"])
    if "session_start" in z:
        eng.session_start = int(z["session_start"])
        eng._rebased = bool(z["rebased"])
    if "gps_alt_offset" in z:
        off = float(z["gps_alt_offset"])
        eng.gps_alt_offset = None if np.isnan(off) else off
    eng.odometry.pose = np.asarray(z["odo_pose"])
    eng.odometry.last_rel = np.asarray(z["odo_last_rel"])
    eng.odometry.num_scans = eng.num_scans
    # odometry carry (prev scan features) is not persisted: the first scan
    # after resume re-seeds it (one-scan gap, same as the reference's restart)
    eng.odometry.prev = None

    g = eng.graph.g
    eng.graph.g = g._replace(
        poses=jnp.asarray(z["graph_poses"]),
        num_nodes=jnp.asarray(int(z["graph_num_nodes"]), jnp.int32),
        odom_meas=jnp.asarray(z["graph_odom_meas"]),
        odom_valid=jnp.asarray(z["graph_odom_valid"]),
        loop_i=jnp.asarray(z["graph_loop_i"]),
        loop_j=jnp.asarray(z["graph_loop_j"]),
        loop_meas=jnp.asarray(z["graph_loop_meas"]),
        loop_valid=jnp.asarray(z["graph_loop_valid"]),
        gps_meas=jnp.asarray(z["graph_gps_meas"]),
        gps_valid=jnp.asarray(z["graph_gps_valid"]),
    )
    eng.graph.num_nodes = int(z["graph_num_nodes"])
    eng.graph.num_loops = int(z["num_loops"])
    eng.loops = [
        LoopEvent(int(r[0]), int(r[1]), float(r[2]), float(r[3]), None)
        for r in z["loop_events"]
    ]
    return eng
