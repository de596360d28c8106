"""Parity tests: Pallas kernels vs XLA reference implementations.

On the CPU test mesh the kernels run in interpreter mode; the same code
compiles on TPU (exercised by bench.py / the driver's compile check)."""

import jax.numpy as jnp
import numpy as np

from navtech_radar_slam_tpu.ops import icp as icp_ops
from navtech_radar_slam_tpu.ops import scancontext as sc_ops
from navtech_radar_slam_tpu.ops.pallas import (
    nearest_neighbors_pallas,
    sc_shift_distances_pallas,
)
from navtech_radar_slam_tpu.config import ScanContextConfig

CFG = ScanContextConfig()


def _desc(seed, n=250):
    rng = np.random.default_rng(seed)
    r = rng.uniform(5, 75, n)
    th = rng.uniform(0, 2 * np.pi, n)
    xy = jnp.asarray(np.stack([r * np.cos(th), r * np.sin(th)], -1), jnp.float32)
    return sc_ops.make_scancontext(xy, jnp.zeros(n), jnp.ones(n, bool), CFG)


def _xla_dist_matrix(query, bank):
    """Reference full (N, S) distance matrix via the XLA implementation's
    internals (sc_distance_all_shifts reduced form re-expanded)."""
    R, S = query.shape
    qn, qnz = sc_ops._normalize_columns(query)
    bn, bnz = sc_ops._normalize_columns(bank)
    col_idx = jnp.mod(jnp.arange(S)[None, :] + jnp.arange(S)[:, None], S)
    q_rolled = jnp.moveaxis(qn[:, col_idx], 1, 0)
    qnz_rolled = qnz[col_idx]
    C = jnp.einsum("zrc,nrc->nz", q_rolled, bn)
    counts = jnp.einsum("zc,nc->nz", qnz_rolled.astype(jnp.float32),
                        bnz.astype(jnp.float32))
    dist = 1.0 - C / jnp.maximum(counts, 1.0)
    return jnp.where(counts > 0, dist, 1.0)


def test_sc_corr_kernel_matches_xla():
    bank = jnp.stack([_desc(i) for i in range(12)])
    query = _desc(99)
    ref = np.asarray(_xla_dist_matrix(query, bank))
    out = np.asarray(sc_shift_distances_pallas(query, bank, interpret=True))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, atol=2e-5)


def test_sc_corr_kernel_best_shift_agrees():
    bank = jnp.stack([_desc(i) for i in range(6)])
    query = _desc(3)  # identical to bank[3]
    dist = np.asarray(sc_shift_distances_pallas(query, bank, interpret=True))
    ref_d, ref_s = sc_ops.sc_distance_all_shifts(query, bank)
    np.testing.assert_allclose(dist.min(axis=1), np.asarray(ref_d), atol=2e-5)
    assert int(dist[3].argmin()) == int(np.asarray(ref_s)[3]) == 0
    assert dist[3].min() < 1e-5


def test_nn_kernel_matches_xla(rng):
    src = jnp.asarray(rng.uniform(-150, 150, (300, 2)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(-150, 150, (900, 2)), jnp.float32)
    tv = jnp.asarray(rng.random(900) > 0.2)
    d_ref, i_ref = icp_ops.nearest_neighbors(src, tgt, tv)
    d_out, i_out = nearest_neighbors_pallas(src, tgt, tv, interpret=True)
    np.testing.assert_array_equal(np.asarray(i_out), np.asarray(i_ref))
    # the kernel's subtract-square form is MORE accurate than the XLA
    # reference's |a|²+|b|²-2ab expansion (cancellation at ±150 m), so the
    # distances agree only to the expansion's own error (~1e-2 m²)
    np.testing.assert_allclose(np.asarray(d_out), np.asarray(d_ref),
                               rtol=1e-3, atol=1e-2)


def test_nn_kernel_all_invalid(rng):
    src = jnp.asarray(rng.uniform(-10, 10, (64, 2)), jnp.float32)
    tgt = jnp.asarray(rng.uniform(-10, 10, (128, 2)), jnp.float32)
    tv = jnp.zeros(128, bool)
    d, i = nearest_neighbors_pallas(src, tgt, tv, interpret=True)
    assert np.isinf(np.asarray(d)).all()


def test_cen2019_kernel_matches_xla():
    """Fused peak-detection kernel vs the XLA pipeline on a simulated scan."""
    import jax

    from navtech_radar_slam_tpu.config import SlamConfig
    from navtech_radar_slam_tpu.data import RadarSimulator
    from navtech_radar_slam_tpu.ops import cen2019
    from navtech_radar_slam_tpu.ops.pallas.cen_peaks import cen2019_scores_pallas

    cfg = SlamConfig()
    sim = RadarSimulator(cfg.radar)
    scan = jnp.asarray(sim.render(np.asarray([5.0, -3.0, 0.7]), noise_seed=3))

    ref = cen2019.cen2019_features(scan, cfg.features, cfg.radar)
    scores = cen2019_scores_pallas(scan, cfg.features, cfg.radar, interpret=True)
    out = cen2019._finalize_topk_scores(scores, cfg.features.max_features)

    rv = np.asarray(ref.valid)
    ov = np.asarray(out.valid)
    assert rv.sum() == ov.sum()
    ref_set = set(zip(np.asarray(ref.azimuth_idx)[rv].tolist(),
                      np.asarray(ref.range_bin)[rv].tolist()))
    out_set = set(zip(np.asarray(out.azimuth_idx)[ov].tolist(),
                      np.asarray(out.range_bin)[ov].tolist()))
    # identical peak sets up to float-order ties
    sym = ref_set.symmetric_difference(out_set)
    assert len(sym) <= 0.01 * len(ref_set), f"{len(sym)} differing peaks"
    np.testing.assert_allclose(
        np.sort(np.asarray(out.power)[ov]), np.sort(np.asarray(ref.power)[rv]),
        atol=1e-5,
    )
