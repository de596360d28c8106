import dataclasses
import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from test_slam import small_cfg  # noqa: E402

from navtech_radar_slam_tpu.data import RadarSimulator  # noqa: E402
from navtech_radar_slam_tpu.models.slam import SlamEngine  # noqa: E402
from navtech_radar_slam_tpu.utils import checkpoint as ckpt  # noqa: E402
from navtech_radar_slam_tpu.utils import geometry as geo  # noqa: E402


def test_multisession_merge(tmp_path):
    """Session A maps a circuit; session B starts elsewhere on the same
    circuit: an inter-session loop must fire and place B in A's frame."""
    cfg = dataclasses.replace(
        small_cfg(),
        keyframes=dataclasses.replace(small_cfg().keyframes, max_keyframes=128),
        pgo=dataclasses.replace(small_cfg().pgo, max_nodes=128,
                                odom_sigma_rot=0.005, odom_sigma_trans=0.05),
    )
    sim = RadarSimulator(cfg.radar)

    # session A: 2/3 of the circuit
    gt_a = sim.circuit_trajectory(30, radius=10.0, speed=6.0)
    eng_a = SlamEngine(cfg)
    for i in range(30):
        eng_a.process(sim.render(gt_a[i], noise_seed=i), timestamp=i * 0.25)
    ck = str(tmp_path / "session_a.npz")
    ckpt.save_engine(eng_a, ck)

    # session B: starts at scan 5's true pose, drives 20 scans over mapped area
    gt_b = sim.circuit_trajectory(60, radius=10.0, speed=6.0)[5:25]
    eng_b = SlamEngine(cfg)
    eng_b.attach_prior_session(ck)
    assert eng_b.session_start == 30
    for i in range(20):
        eng_b.process(sim.render(gt_b[i], noise_seed=500 + i), timestamp=100 + i * 0.25)

    inter = [e for e in eng_b.loops if e.prev_idx < 30 <= e.curr_idx]
    assert len(inter) >= 1, f"no inter-session loops: {[(e.prev_idx, e.curr_idx) for e in eng_b.loops]}"
    assert eng_b._rebased

    # after the merge, session B keyframe j should sit near its true pose
    # expressed in A's frame (A starts at gt_a[0])
    traj = eng_b.trajectory()
    g0 = jnp.asarray(gt_a[0], jnp.float32)
    errs = []
    for j in range(eng_b.session_start, eng_b.num_keyframes):
        scan_idx = j - eng_b.session_start
        gt_world = np.asarray(
            geo.se2_between(g0, jnp.asarray(gt_b[scan_idx], jnp.float32))
        )
        est = np.asarray(geo.se3_to_se2(jnp.asarray(traj[j])))
        errs.append(np.linalg.norm(est[:2] - gt_world[:2]))
    errs = np.asarray(errs)
    assert errs.mean() < 1.5, f"mean placement error {errs.mean():.2f} m"
    # prior session stays anchored
    np.testing.assert_allclose(
        traj[0], np.asarray(eng_a.trajectory()[0]), atol=1e-5
    )


def test_attach_requires_fresh_engine(tmp_path):
    cfg = small_cfg()
    sim = RadarSimulator(cfg.radar)
    eng = SlamEngine(cfg)
    eng.process(sim.render(np.array([10.0, 0, 0]), noise_seed=0))
    ck = str(tmp_path / "x.npz")
    ckpt.save_engine(eng, ck)
    eng2 = SlamEngine(cfg)
    eng2.process(sim.render(np.array([10.0, 0, 0]), noise_seed=0))
    try:
        eng2.attach_prior_session(ck)
        assert False
    except RuntimeError:
        pass


def test_multisession_chunked_matches_per_scan(tmp_path):
    """Session B streamed in CHUNKS over an attached prior session must
    reproduce the per-scan session-B merge: same inter-session loops fire,
    rebase happens, and the trajectories agree (the fused segments must
    honor session_start — no odometry Between across the gap, consistency
    gate exempting inter-session pairs)."""
    cfg = dataclasses.replace(
        small_cfg(),
        keyframes=dataclasses.replace(small_cfg().keyframes, max_keyframes=128),
        pgo=dataclasses.replace(small_cfg().pgo, max_nodes=128,
                                odom_sigma_rot=0.005, odom_sigma_trans=0.05),
    )
    sim = RadarSimulator(cfg.radar)

    gt_a = sim.circuit_trajectory(30, radius=10.0, speed=6.0)
    eng_a = SlamEngine(cfg)
    for i in range(30):
        eng_a.process(sim.render(gt_a[i], noise_seed=i), timestamp=i * 0.25)
    ck = str(tmp_path / "session_a.npz")
    ckpt.save_engine(eng_a, ck)

    gt_b = sim.circuit_trajectory(60, radius=10.0, speed=6.0)[5:29]
    scans_b = [sim.render(gt_b[i], noise_seed=500 + i) for i in range(24)]

    eng_p = SlamEngine(cfg)
    eng_p.attach_prior_session(ck)
    for i in range(24):
        eng_p.process(scans_b[i], timestamp=100 + i * 0.25)
    eng_p.current_pose()   # drain the deferred decisions before comparing

    eng_c = SlamEngine(cfg)
    eng_c.attach_prior_session(ck)
    S = 8
    for c0 in range(0, 24, S):
        eng_c.process_chunk(
            np.stack(scans_b[c0:c0 + S]),
            timestamps=[100 + i * 0.25 for i in range(c0, c0 + S)],
        )
    eng_c.current_pose()

    assert eng_c.num_keyframes == eng_p.num_keyframes
    inter_c = [e for e in eng_c.loops if e.prev_idx < 30 <= e.curr_idx]
    assert len(inter_c) >= 1 and eng_c._rebased
    lp = [(e.prev_idx, e.curr_idx) for e in eng_p.loops]
    lc = [(e.prev_idx, e.curr_idx) for e in eng_c.loops]
    assert lc == lp, (lc, lp)
    np.testing.assert_allclose(
        np.asarray(eng_c.trajectory()), np.asarray(eng_p.trajectory()),
        atol=1e-3,
    )
