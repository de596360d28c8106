import dataclasses
import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from test_slam import small_cfg  # noqa: E402

from navtech_radar_slam_tpu.data import RadarSimulator  # noqa: E402
from navtech_radar_slam_tpu.models.odometry import (  # noqa: E402
    RadarOdometry, motion_compensate,
)
from navtech_radar_slam_tpu.utils import geometry as geo  # noqa: E402


def test_motion_compensate_identity():
    xy = jnp.asarray([[10.0, 0.0], [0.0, 20.0]], jnp.float32)
    out = motion_compensate(xy, jnp.asarray([0.1, 0.9]), jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(out), np.asarray(xy), atol=1e-6)


def test_motion_compensate_rotation():
    """A point seen at sweep-end under pure rotation maps back by the full
    twist angle; a point at sweep-start is untouched."""
    xy = jnp.asarray([[10.0, 0.0], [10.0, 0.0]], jnp.float32)
    frac = jnp.asarray([0.0, 1.0])
    twist = jnp.asarray([0.0, 0.0, 0.5])
    out = np.asarray(motion_compensate(xy, frac, twist))
    np.testing.assert_allclose(out[0], [10.0, 0.0], atol=1e-6)
    np.testing.assert_allclose(
        out[1], [10 * np.cos(0.5), 10 * np.sin(0.5)], atol=1e-5
    )


def _run_pair(compensate: bool, n=6):
    """Odometry over distorted scans (fast turn), with/without de-skew.
    Returns the mean steady-state (i >= 3) translation error — the first
    pair is a documented bootstrap transient (scan 0 is stored raw)."""
    base = small_cfg()
    cfg = dataclasses.replace(
        base,
        features=dataclasses.replace(base.features,
                                     motion_compensation=compensate),
    )
    sim = RadarSimulator(cfg.radar)
    # strong turn: 0.3 rad per sweep
    poses = np.zeros((n + 1, 3))
    for i in range(1, n + 1):
        step = np.asarray([1.5, 0.0, 0.3])
        poses[i] = np.asarray(
            geo.se2_mul(jnp.asarray(poses[i - 1], jnp.float32),
                        jnp.asarray(step, jnp.float32))
        )
    odo = RadarOdometry(cfg)
    for i in range(n):
        scan = sim.render(poses[i], noise_seed=i, end_pose=poses[i + 1])
        odo.process(scan)
    # accumulated drift: distortion bias integrates linearly with distance,
    # per-frame noise only as sqrt(n) — the metric that matters for SLAM
    gt_end = np.asarray(
        geo.se2_between(jnp.asarray(poses[0], jnp.float32),
                        jnp.asarray(poses[n - 1], jnp.float32))
    )
    return float(np.linalg.norm(odo.pose[:2] - gt_end[:2]))


def test_deskew_improves_distorted_odometry():
    err_off = _run_pair(False, n=12)
    err_on = _run_pair(True, n=12)
    # de-skew must substantially reduce accumulated drift under fast turning
    assert err_on < err_off * 0.7, (err_on, err_off)
