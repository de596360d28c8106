"""Unit tests for trajectory metrics (utils/metrics.py).

The reference validates only visually (SURVEY §4); these pin down the
quantitative metrics BASELINE.md requires — in particular that RTE is a
proper LOCAL-FRAME relative pose error (KITTI/TUM style), rotation-aware,
verified against hand-computed cases."""

import numpy as np
import pytest

from navtech_radar_slam_tpu.utils import metrics


def test_rpe_hand_computed_rotation_case():
    # est takes a 90-deg left turn the reference doesn't have.
    # Segment 0: positions match but est yaw jumps to pi/2 at pose 1
    #   -> rel transforms (1,0,pi/2) vs (1,0,0): zero translation error,
    #      pi/2 rotation error.
    # Segment 1: est moves +y in world but its local frame is rotated, so
    #   rel_est = (1,0,0) = rel_ref: zero error.
    est = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, np.pi / 2], [1.0, 1.0, np.pi / 2]])
    ref = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [2.0, 0.0, 0.0]])
    t_rmse, r_rmse = metrics.relative_pose_error(est, ref, delta=1)
    np.testing.assert_allclose(t_rmse, 0.0, atol=1e-12)
    np.testing.assert_allclose(r_rmse, np.sqrt((np.pi / 2) ** 2 / 2), atol=1e-12)


def test_rpe_heading_error_shows_in_translation():
    """A constant heading bias with IDENTICAL positions: the old world-frame
    displacement difference scored this 0; local-frame RPE must not."""
    n = 20
    ref = np.stack([np.arange(n, dtype=float), np.zeros(n), np.zeros(n)], 1)
    est = ref.copy()
    est[:, 2] = 0.1  # 0.1 rad heading bias, positions identical
    t_rmse, r_rmse = metrics.relative_pose_error(est, ref, delta=1)
    # per segment: rotate (1,0) by -0.1 vs (1,0) -> chord length 2 sin(0.05)
    np.testing.assert_allclose(t_rmse, 2 * np.sin(0.05), atol=1e-9)
    np.testing.assert_allclose(r_rmse, 0.0, atol=1e-12)
    assert metrics.rte(est, ref, delta=1) == t_rmse


def test_rpe_identical_trajectories_zero():
    rng = np.random.default_rng(3)
    traj = np.cumsum(rng.normal(size=(50, 3)) * [1.0, 1.0, 0.05], axis=0)
    t_rmse, r_rmse = metrics.relative_pose_error(traj, traj.copy(), delta=7)
    assert t_rmse < 1e-9 and r_rmse < 1e-9


def test_rpe_invariant_to_global_rigid_transform():
    """Relative pose error must not depend on the world frame (no alignment
    needed) — a rigidly transformed copy scores zero."""
    rng = np.random.default_rng(4)
    traj = np.cumsum(rng.normal(size=(40, 3)) * [1.0, 0.5, 0.04], axis=0)
    th, tx, ty = 0.7, 12.0, -3.0
    c, s = np.cos(th), np.sin(th)
    moved = traj.copy()
    moved[:, 0] = c * traj[:, 0] - s * traj[:, 1] + tx
    moved[:, 1] = s * traj[:, 0] + c * traj[:, 1] + ty
    moved[:, 2] = traj[:, 2] + th
    t_rmse, r_rmse = metrics.relative_pose_error(moved, traj, delta=5)
    assert t_rmse < 1e-9 and r_rmse < 1e-9


def test_rpe_xy_only_derives_heading():
    """(N,2) inputs get tangent-derived yaw, so a heading-bent estimate is
    still penalized in the local frame."""
    n = 30
    ref = np.stack([np.arange(n, dtype=float), np.zeros(n)], 1)
    bent = ref.copy()
    bent[n // 2:, 1] = np.arange(n - n // 2) * 0.5  # veers off halfway
    t_rmse, _ = metrics.relative_pose_error(bent, ref, delta=5)
    assert t_rmse > 0.1
    assert np.isnan(metrics.relative_pose_error(ref[:3], ref[:3], delta=10)[0])


def test_loop_recall_precision_min_separation_on_accepts():
    """A trivially-near accepted pair (j-2, j) must count as neither correct
    nor detected — only pairs at >= min_separation do."""
    xy = np.zeros((60, 2))
    xy[:30, 0] = np.arange(30)
    xy[30:, 0] = np.arange(29, -1, -1)
    # (54, 56) are within 2 m of each other but only 2 frames apart
    r, p = metrics.loop_recall_precision(
        [(54, 56)], xy, dist_thresh=3.0, min_separation=30
    )
    assert p == 0.0 and r == 0.0
    # the same j with a genuine long-range partner counts
    r2, p2 = metrics.loop_recall_precision(
        [(2, 56)], xy, dist_thresh=3.0, min_separation=30
    )
    assert p2 == 1.0 and r2 > 0.0
