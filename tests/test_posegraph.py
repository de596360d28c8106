import dataclasses

import jax.numpy as jnp
import numpy as np

from navtech_radar_slam_tpu.config import PgoConfig
from navtech_radar_slam_tpu.models import posegraph as pg
from navtech_radar_slam_tpu.utils import geometry as geo

CFG = dataclasses.replace(
    PgoConfig(), max_nodes=64, max_loop_edges=16,
    gn_iters=10, cg_iters=100,
    # test-scale noise model: realistic radar-odometry sigmas rather than
    # the reference's near-rigid 1e-3/1e-2 (which make single-loop toy
    # problems ignore the loop by design)
    odom_sigma_rot=0.01, odom_sigma_trans=0.05,
)


def se3_xyyaw(x, y, yaw):
    return np.asarray(geo.se2_to_se3(jnp.asarray([x, y, yaw], jnp.float32)))


def se2_of(T):
    return np.asarray(geo.se3_to_se2(jnp.asarray(T)))


def build_noisy_chain(n, rng, cfg=CFG, step=1.0):
    """Ground truth: straight line. Odometry: per-edge noise at exactly the
    configured sigmas (the calibrated regime). Returns (graph, gt_poses)."""
    graph = pg.PoseGraph(cfg)
    gt = [np.eye(4, dtype=np.float32)]
    est = np.eye(4, dtype=np.float32)
    graph.add_node(est)
    for k in range(1, n):
        gt.append(gt[-1] @ se3_xyyaw(step, 0.0, 0.0))
        meas = se3_xyyaw(
            step + rng.normal(0, cfg.odom_sigma_trans),
            rng.normal(0, cfg.odom_sigma_trans),
            rng.normal(0, cfg.odom_sigma_rot),
        )
        est = est @ meas
        graph.add_node(est, odom_meas=meas)
    return graph, np.stack(gt)


def ate(poses, gt):
    return np.sqrt(((poses[:, :3, 3] - gt[:, :3, 3]) ** 2).sum(-1).mean())


def test_chain_without_loops_keeps_odometry(rng):
    g, _ = build_noisy_chain(10, rng)
    before = g.poses().copy()
    g.optimize()
    # odometry-only graph: optimum IS the dead-reckoned chain
    np.testing.assert_allclose(g.poses(), before, atol=1e-3)
    np.testing.assert_allclose(g.poses()[0], np.eye(4), atol=1e-6)


def test_loops_correct_random_drift(rng):
    n = 40
    g, gt = build_noisy_chain(n, rng)
    ate_before = ate(g.poses(), gt)
    # loop factors every 8 nodes against node 0, true relative poses
    for j in range(8, n, 8):
        rel = np.asarray(geo.se3_between(jnp.asarray(gt[0]), jnp.asarray(gt[j])))
        g.add_loop(0, j, rel)
    err32_before = np.linalg.norm(g.poses()[32][:3, 3] - gt[32][:3, 3])
    g.optimize()
    ate_after = ate(g.poses(), gt)
    assert ate_after < 0.6 * ate_before, (ate_before, ate_after)
    np.testing.assert_allclose(g.poses()[0], np.eye(4), atol=1e-6)
    # loop endpoint pulled toward ground truth (Cauchy equilibrium: partial)
    err32_after = np.linalg.norm(g.poses()[32][:3, 3] - gt[32][:3, 3])
    assert err32_after < 0.75 * err32_before, (err32_before, err32_after)


def test_outlier_loop_downweighted(rng):
    n = 40
    g, gt = build_noisy_chain(n, rng)
    for j in range(8, n, 8):
        rel = np.asarray(geo.se3_between(jnp.asarray(gt[0]), jnp.asarray(gt[j])))
        g.add_loop(0, j, rel)
    g.optimize()
    clean_ate = ate(g.poses(), gt)
    # inject a wildly wrong loop; Cauchy must keep the solution close
    g.add_loop(2, 37, se3_xyyaw(-4.0, 11.0, 2.9))
    g.optimize()
    dirty_ate = ate(g.poses(), gt)
    assert dirty_ate < clean_ate + 0.15, (clean_ate, dirty_ate)


def test_gps_altitude_pull(rng):
    n = 10
    g, _ = build_noisy_chain(n, rng)
    for k in range(n):
        g.add_gps(k, np.array([0.0, 0.0, 2.0]))
    g.optimize()
    z = g.poses()[:, 2, 3]
    assert np.isfinite(z).all()
    assert abs(float(z[0])) < 1e-6  # gauge fixed


def test_incremental_warm_start(rng):
    """Re-solving after each added node stays consistent (iSAM2-like use)."""
    g = pg.PoseGraph(CFG)
    meas = se3_xyyaw(1.0, 0.0, 0.05)
    pose = np.eye(4, dtype=np.float32)
    g.add_node(pose)
    for k in range(1, 12):
        pose = pose @ meas
        g.add_node(pose, odom_meas=meas)
        g.optimize()
    poses = g.poses()
    assert np.isfinite(poses).all()
    np.testing.assert_allclose(poses[0], np.eye(4), atol=1e-6)
    rel = np.asarray(geo.se3_between(jnp.asarray(poses[5]), jnp.asarray(poses[6])))
    np.testing.assert_allclose(rel, np.asarray(se3_xyyaw(1.0, 0.0, 0.05)), atol=1e-3)


def test_capacity_guard():
    small = dataclasses.replace(CFG, max_nodes=2)
    g = pg.PoseGraph(small)
    g.add_node(np.eye(4))
    g.add_node(np.eye(4), odom_meas=np.eye(4))
    try:
        g.add_node(np.eye(4), odom_meas=np.eye(4))
        assert False, "expected capacity error"
    except RuntimeError:
        pass


def test_bucketed_solver_matches_full():
    """The bucketed (active-prefix) solver returns the same poses as solving
    at full padded capacity."""
    import dataclasses

    import jax.numpy as jnp

    from navtech_radar_slam_tpu.models import posegraph as pg
    from navtech_radar_slam_tpu.utils import geometry as geo

    from navtech_radar_slam_tpu.config import PgoConfig
    cfg = dataclasses.replace(
        PgoConfig(), max_nodes=256, max_loop_edges=64,
        gn_iters=4, cg_iters=32,
    )
    graph = pg.PoseGraph(cfg)
    pose = np.eye(4, dtype=np.float32)
    graph.add_node(pose)
    step = np.asarray(geo.se2_to_se3(jnp.asarray([1.0, 0.0, 0.1], jnp.float32)))
    for _ in range(1, 60):   # 60 active nodes in a 256 capacity
        pose = pose @ step
        graph.add_node(pose, odom_meas=step)
    graph.add_loop(0, 59, np.asarray(
        geo.se2_to_se3(jnp.asarray([0.5, 0.2, 0.05], jnp.float32))
    ))

    full = pg.make_solver(cfg)
    bucketed = pg.make_bucketed_solver(cfg)
    g_full = full(graph.g)
    g_buck = bucketed(graph.g, graph.num_nodes, graph.num_loops)
    n = graph.num_nodes
    # f32 reduction orders differ between the 64- and 256-wide solves, so
    # CG trajectories diverge at the last-mantissa level; 5e-4 m/rad bounds
    # the accumulated difference after 4 GN iterations
    np.testing.assert_allclose(
        np.asarray(g_buck.poses[:n]), np.asarray(g_full.poses[:n]),
        rtol=0, atol=5e-4,
    )
    # untouched padding beyond the bucket stays identity
    np.testing.assert_allclose(
        np.asarray(g_buck.poses[128:]),
        np.broadcast_to(np.eye(4, dtype=np.float32), (cfg.max_nodes - 128, 4, 4)),
    )
