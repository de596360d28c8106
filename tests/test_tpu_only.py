"""Tests that only run on a REAL TPU backend (skipped in the CPU CI mesh).

These cover default-config behaviors that differ between backends — the
approximate top-k peak selection (`lax.approx_max_k` lowers to the TPU
PartialReduce; CPU silently falls back to exact) and the Pallas kernels'
default-on dispatch.  Run manually with the repo's one TPU chip:

    NRS_TESTS_TPU=1 timeout 900 python -m pytest tests/test_tpu_only.py -q

(NRS_TESTS_TPU=1 stops conftest.py from forcing the CPU backend.  Do NOT
run concurrently with another TPU process — single tunneled chip.)
"""

import dataclasses

import numpy as np
import pytest

# NOTE: do not import tests/conftest.py's CPU forcing here — this file must
# see the real backend.  conftest sets jax_platforms=cpu for the whole
# session, so these tests detect that and skip under the CPU suite.
import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="needs the real TPU backend (CPU suite forces jax_platforms=cpu)",
)


def test_approx_topk_default_matches_exact_features():
    """ADVICE r1: topk_recall=0.95 silently switches TPU peak selection to
    lax.approx_max_k while CPU CI tests the exact path.  Pin the default
    TPU behavior: the approximate feature set must cover >= 90 % of the
    exact set, and the strongest peaks must be identical."""
    import jax.numpy as jnp

    from navtech_radar_slam_tpu.config import SlamConfig
    from navtech_radar_slam_tpu.data import RadarSimulator
    from navtech_radar_slam_tpu.ops import cen2019

    cfg = SlamConfig()
    fcfg_approx = cfg.features                      # default 0.95
    assert fcfg_approx.topk_recall < 1.0
    fcfg_exact = dataclasses.replace(cfg.features, topk_recall=1.0)
    sim = RadarSimulator(cfg.radar)
    scan = jnp.asarray(sim.render(np.asarray([5.0, -3.0, 0.4]), noise_seed=3))

    fa = jax.device_get(cen2019.extract_features(scan, fcfg_approx, cfg.radar))
    fe = jax.device_get(cen2019.extract_features(scan, fcfg_exact, cfg.radar))

    set_a = {(int(a), int(r)) for a, r, v in
             zip(fa.azimuth_idx, fa.range_bin, fa.valid) if v}
    set_e = {(int(a), int(r)) for a, r, v in
             zip(fe.azimuth_idx, fe.range_bin, fe.valid) if v}
    assert len(set_e) > 0
    recall = len(set_a & set_e) / len(set_e)
    assert recall >= 0.90, f"approx top-k realized recall {recall:.3f}"

    # the strongest 100 exact peaks must all survive approximation
    order = np.argsort(-fe.power)
    strong = [(int(fe.azimuth_idx[i]), int(fe.range_bin[i]))
              for i in order[:100] if fe.valid[i]]
    missing = [s for s in strong if s not in set_a]
    assert not missing, f"approx dropped strong peaks: {missing[:5]}"


def test_full_slam_closes_loops_on_tpu_default_config():
    """End-to-end engine on the real chip with SHIPPED defaults (whitened
    fitness gate, voxel filters, deferred loop commits, Pallas kernels on):
    loops close and the trajectory is finite."""
    from navtech_radar_slam_tpu.data import RadarSimulator
    from navtech_radar_slam_tpu.config import SlamConfig
    from navtech_radar_slam_tpu.models.slam import SlamEngine

    cfg = SlamConfig()
    sim = RadarSimulator(cfg.radar)
    n = 60
    gt = sim.circuit_trajectory(n, radius=10.0, speed=6.0)
    scans = np.stack([sim.render(gt[i], noise_seed=i) for i in range(n)])
    eng = SlamEngine(cfg)
    for c0 in range(0, n, 12):
        eng.process_chunk(scans[c0:c0 + 12])
    assert eng.num_keyframes >= n - 2
    assert len(eng.loops) >= 1
    assert np.isfinite(eng.trajectory()).all()
