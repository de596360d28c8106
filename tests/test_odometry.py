import numpy as np
import jax.numpy as jnp

from navtech_radar_slam_tpu.config import SlamConfig
from navtech_radar_slam_tpu.data import RadarSimulator
from navtech_radar_slam_tpu.models.odometry import RadarOdometry
from navtech_radar_slam_tpu.utils import geometry as geo


def test_odometry_pair():
    """Two consecutive simulated scans: estimated increment ~= ground truth."""
    cfg = SlamConfig()
    sim = RadarSimulator(cfg.radar)
    poses = sim.circuit_trajectory(3)
    odo = RadarOdometry(cfg)
    odo.process(sim.render(poses[0], noise_seed=0))
    est_pose, _ = odo.process(sim.render(poses[1], noise_seed=1))

    gt_rel = np.asarray(
        geo.se2_between(jnp.asarray(poses[0], jnp.float32), jnp.asarray(poses[1], jnp.float32))
    )
    res = odo.last_result
    assert bool(res.ok), f"registration failed, {int(res.num_inliers)} inliers"
    est_rel = np.asarray(res.rel_pose)
    assert np.linalg.norm(est_rel[:2] - gt_rel[:2]) < 0.15, (est_rel, gt_rel)
    assert abs(est_rel[2] - gt_rel[2]) < 0.01


def test_odometry_short_sequence():
    """10-scan dead-reckoning: ATE small relative to path length."""
    cfg = SlamConfig()
    sim = RadarSimulator(cfg.radar)
    gt = sim.random_trajectory(10, speed=4.0, seed=3)
    odo = RadarOdometry(cfg)
    est = []
    for i in range(len(gt)):
        pose, _ = odo.process(sim.render(gt[i], noise_seed=100 + i))
        est.append(pose)
    est = np.asarray(est)

    # align first pose (both start at origin-ish); gt starts at origin
    err = est[:, :2] - gt[:, :2]
    ate = np.sqrt((np.linalg.norm(err, axis=1) ** 2).mean())
    path_len = np.sum(np.linalg.norm(np.diff(gt[:, :2], axis=0), axis=1))
    assert ate < 0.05 * path_len, f"ATE {ate:.3f} m over {path_len:.1f} m path"


def test_odometry_sequence_matches_stepwise():
    """Device-side lax.scan streaming == host per-scan stepping."""
    import dataclasses

    from navtech_radar_slam_tpu.models import odometry as odo_mod

    cfg = SlamConfig()
    cfg = cfg.replace(
        features=dataclasses.replace(
            cfg.features, max_features=256, max_matches=128
        ),
        registration=dataclasses.replace(
            cfg.registration, spectral_top_k=128, gnc_max_iters=8,
            cote_iters=4, refine_iters=4,
        ),
    )
    sim = RadarSimulator(cfg.radar)
    gt = sim.random_trajectory(6, speed=4.0, seed=7)
    scans = [sim.render(gt[i], noise_seed=200 + i) for i in range(len(gt))]

    # reference: host stepping
    odo = RadarOdometry(cfg)
    rels_step = []
    for s in scans:
        odo.process(s)
        rels_step.append(odo.last_applied_rel.copy())
    rels_step = np.asarray(rels_step[1:])  # first scan seeds the carry

    # device-side sequence over the same scans
    az = jnp.asarray(odo.default_azimuths())
    prev = odo_mod.extract_scan_features(jnp.asarray(scans[0]), az, cfg)
    seq = odo_mod.make_odometry_sequence(cfg)
    powers = jnp.stack([jnp.asarray(s) for s in scans[1:]])
    _, _, _, rels, oks, _ = seq(
        powers, az, prev, jnp.zeros(3, jnp.float32), jnp.asarray(0, jnp.int32)
    )
    assert bool(np.asarray(oks).all())
    np.testing.assert_allclose(np.asarray(rels), rels_step, rtol=0, atol=1e-5)


def test_packed4_wire_format_roundtrip_and_pipeline():
    """data/packing.py: the 4-bit companded wire format must unpack on
    device exactly as the host reference, and the odometry pipeline must
    accept packed chunks (self-describing by trailing-dim shape) with
    near-u8 registration quality."""
    import numpy as np
    import jax.numpy as jnp

    from navtech_radar_slam_tpu.config import SlamConfig
    from navtech_radar_slam_tpu.data import RadarSimulator
    from navtech_radar_slam_tpu.data.packing import pack4, unpack4_reference
    from navtech_radar_slam_tpu.models import odometry as odo_mod
    from navtech_radar_slam_tpu.utils import geometry as geo

    cfg = SlamConfig()
    sim = RadarSimulator(cfg.radar)
    gt = sim.circuit_trajectory(3, radius=10.0, speed=6.0)
    u8 = np.stack([
        (np.clip(sim.render(gt[i], noise_seed=i), 0, 1) * 255).astype(np.uint8)
        for i in range(3)
    ])
    packed = pack4(u8)
    assert packed.shape[-1] == cfg.radar.padded_range_bins // 2

    # device unpack == host reference (probe via the extraction input path:
    # compare feature sets from packed vs pre-dequantized float input)
    na = cfg.radar.num_azimuths
    az = jnp.asarray((np.arange(na) + 0.5) / na * 2 * np.pi, jnp.float32)
    f_packed = odo_mod.extract_scan_features(jnp.asarray(packed[0]), az, cfg)
    f_ref = odo_mod.extract_scan_features(
        jnp.asarray(unpack4_reference(packed[0])), az, cfg)
    np.testing.assert_array_equal(np.asarray(f_packed.valid),
                                  np.asarray(f_ref.valid))
    np.testing.assert_allclose(np.asarray(f_packed.xy),
                               np.asarray(f_ref.xy), atol=1e-5)

    # registration through the packed sequence stays near the u8 result
    seq = odo_mod.make_odometry_sequence(cfg, return_features=True)

    def run(scans):
        carry = odo_mod.extract_scan_features(jnp.asarray(scans[0]), az, cfg)
        out = seq(jnp.asarray(scans), az, carry,
                  jnp.zeros(3, jnp.float32), jnp.asarray(0, jnp.int32))
        return np.asarray(out[3])   # rels

    rels_p = run(packed)
    rels_u = run(u8)
    np.testing.assert_allclose(rels_p[1:], rels_u[1:], atol=0.05)
    # and both track the ground-truth increment
    rel_gt = np.asarray(geo.se2_between(jnp.asarray(gt[0], jnp.float32),
                                        jnp.asarray(gt[1], jnp.float32)))
    assert np.linalg.norm(rels_p[1][:2] - rel_gt[:2]) < 0.2
