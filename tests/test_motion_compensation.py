import dataclasses
import os
import sys

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(__file__))
from test_slam import small_cfg  # noqa: E402

from navtech_radar_slam_tpu.data import RadarSimulator  # noqa: E402
from navtech_radar_slam_tpu.data.synthetic import SimConfig  # noqa: E402
from navtech_radar_slam_tpu.models.odometry import (  # noqa: E402
    RadarOdometry, doppler_compensate, motion_compensate,
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


def test_doppler_compensate_inverts_distortion():
    """doppler_compensate undoes the measured-range shift r_meas = r - b(d̂·v)
    to first order (d̂ from the measured point differs only at O(b²))."""
    rng = np.random.default_rng(3)
    xy_true = rng.uniform(-80, 80, size=(64, 2)).astype(np.float32)
    xy_true = xy_true[np.linalg.norm(xy_true, axis=1) > 5.0]
    beta, rate = 0.049, 4.0
    twist = jnp.asarray([3.0, 0.5, 0.0], jnp.float32)  # 12+ m/s
    v = np.asarray(twist[:2]) * rate
    r = np.linalg.norm(xy_true, axis=1, keepdims=True)
    d = xy_true / r
    xy_meas = d * (r - beta * (d @ v)[:, None])
    out = np.asarray(doppler_compensate(jnp.asarray(xy_meas), twist, beta, rate))
    np.testing.assert_allclose(out, xy_true, atol=2e-2)


def _doppler_feature_error(compensate: bool):
    """Mean distance from de-skewed features to the true landmarks for one
    Doppler-distorted scan.  Scan-to-scan odometry is insensitive to Doppler
    at constant velocity (both scans carry the same distortion, which cancels
    in the relative estimate — the yeti paper's empirical finding); the
    benefit of compensation is metrically-correct features, i.e. map quality,
    which is what this measures."""
    import jax

    from navtech_radar_slam_tpu.models.odometry import (
        deskew_features, extract_scan_features,
    )

    base = small_cfg()
    cfg = dataclasses.replace(
        base,
        features=dataclasses.replace(
            base.features, motion_compensation=True,
            doppler_compensation=compensate,
        ),
    )
    sim = RadarSimulator(cfg.radar, SimConfig(doppler_beta=0.049))
    pose = np.zeros(3)
    end_pose = np.asarray([3.0, 0.0, 0.0])   # 12 m/s at 4 Hz
    scan = sim.render(pose, noise_seed=0, end_pose=end_pose)
    na = cfg.radar.num_azimuths
    az = jnp.asarray((np.arange(na) + 0.5) / na * 2 * np.pi, jnp.float32)
    feats = extract_scan_features(jnp.asarray(scan), az, cfg)
    twist = jnp.asarray(end_pose, jnp.float32)
    out = jax.jit(lambda f: deskew_features(f, twist, cfg))(feats)

    xy = np.asarray(out.xy)[np.asarray(out.valid)]
    # true landmark positions in the sweep-start sensor frame
    lm = sim.landmarks - pose[:2]
    d = np.linalg.norm(xy[:, None, :] - lm[None, :, :], axis=-1).min(axis=1)
    near = np.linalg.norm(xy, axis=1) < sim.sim.max_visible_range
    # fraction of features metrically on a landmark (within 0.3 m) — robust
    # to the detector's noise features, which dominate a mean/median
    return float(np.mean(d[near] < 0.3))


def test_doppler_compensation_improves_feature_accuracy():
    frac_off = _doppler_feature_error(False)
    frac_on = _doppler_feature_error(True)
    assert frac_on > 2.0 * frac_off, (frac_on, frac_off)
