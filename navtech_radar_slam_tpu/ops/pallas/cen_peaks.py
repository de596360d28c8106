"""Pallas kernel: fused cen2019 polar-image peak detection.

The XLA path (ops/cen2019.py) materializes ~8 full-scan intermediates in HBM
(smoothed power, gradient, h, masks, two segmented scans).  This kernel
keeps the whole (400, 3456) scan resident in VMEM (~5.5 MB) and fuses every
stage into one pass:

  range smoothing (Gaussian taps as lane rolls) -> azimuth-wrapped gradient
  -> per-azimuth noise statistics -> h = s' (1 - g) thresholds -> contiguous
  -run peak selection via **segmented Hillis-Steele max-scans** (log2(NB)
  lane-roll steps, forward + backward) -> peak score map.

Output: (NA, NBp) float32 score map — s_smooth at run peaks, -inf elsewhere;
the caller top-k's it exactly like the XLA path's _finalize_topk.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from navtech_radar_slam_tpu.config import FeatureConfig, RadarConfig


def _roll(x, shift):
    """Circular roll along the lane (last) axis (pltpu.roll needs shift>=0)."""
    return pltpu.roll(x, shift=shift % x.shape[1], axis=1)


def _roll0(x, shift):
    """Circular roll along the sublane (azimuth) axis."""
    return pltpu.roll(x, shift=shift % x.shape[0], axis=0)


def _seg_scan_max(v, reset, col, width, reverse):
    """Inclusive segmented running max along lanes (Hillis-Steele).

    new_m[i] = reset[i] ? m[i] : max(m[i], m[i -/+ d]) with reset-flag
    propagation; shifted-in lanes are neutralized via the column index.
    Flags are float32 0/1 — Mosaic cannot rotate sub-32-bit (bool) data."""
    neg = jnp.float32(-jnp.inf)
    m = v
    r = reset.astype(jnp.float32)
    d = 1
    while d < width:
        if not reverse:
            m_s = _roll(m, d)
            r_s = _roll(r, d)
            edge = col < d
        else:
            m_s = _roll(m, -d)
            r_s = _roll(r, -d)
            edge = col >= width - d
        m_s = jnp.where(edge, neg, m_s)
        r_s = jnp.where(edge, 1.0, r_s)
        m = jnp.where(r > 0.5, m, jnp.maximum(m, m_s))
        r = jnp.maximum(r, r_s)
        d *= 2
    return m


def _kernel(power_ref, out_ref, *, taps, min_bin, nb, zq):
    s_raw = power_ref[:]
    NA, NBp = s_raw.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (NA, NBp), 1)
    region = (col >= min_bin) & (col < nb)
    s = jnp.where(region, s_raw, 0.0)

    # Gaussian smoothing along range: symmetric taps as paired lane rolls
    sm = taps[0] * s
    for i in range(1, len(taps)):
        sm = sm + taps[i] * (_roll(s, i) + _roll(s, -i))

    # gradient along range (central diff), azimuth-smoothed with wrap
    grad = 0.5 * (_roll(sm, 1) - _roll(sm, -1))
    ga = jnp.abs(grad)
    ga = 0.25 * _roll0(ga, 1) + 0.5 * ga + 0.25 * _roll0(ga, -1)
    g = ga / jnp.maximum(jnp.max(ga), 1e-9)

    # per-azimuth noise statistics over the valid region
    regf = region.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(regf, axis=1, keepdims=True), 1.0)
    az_mean = jnp.sum(sm * regf, axis=1, keepdims=True) / denom
    az_var = jnp.sum(jnp.square(sm - az_mean) * regf, axis=1, keepdims=True) / denom

    sp = jnp.maximum(sm - az_mean, 0.0)
    h = sp * (1.0 - g)
    h_mean = jnp.sum(h * regf) / jnp.maximum(jnp.sum(regf), 1.0)
    mask = (h > h_mean) & region
    if zq > 0:  # noise gate optional: zq <= 0 = paper-pure statistic
        noise_gate = az_mean + zq * jnp.sqrt(az_var)
        mask = mask & (sm > noise_gate)

    # one peak per contiguous masked run (segmented scans along lanes);
    # mask travels as float32 where it must be rolled (Mosaic rotate limit)
    neg = jnp.float32(-jnp.inf)
    v = jnp.where(mask, sm, neg)
    mask_f = mask.astype(jnp.float32)
    prev_mask = jnp.where(col < 1, 0.0, _roll(mask_f, 1)) > 0.5
    run_start = mask & jnp.logical_not(prev_mask)
    next_mask = jnp.where(col >= NBp - 1, 0.0, _roll(mask_f, -1)) > 0.5
    run_end = mask & jnp.logical_not(next_mask)

    m_fwd = _seg_scan_max(v, run_start | ~mask, col, NBp, reverse=False)
    m_bwd = _seg_scan_max(v, run_end | ~mask, col, NBp, reverse=True)
    run_max = jnp.maximum(m_fwd, m_bwd)
    m_fwd_excl = jnp.where(
        run_start | ~mask | (col < 1), neg, _roll(m_fwd, 1)
    )
    peaks = mask & (v >= run_max) & (m_fwd_excl < v)
    out_ref[:] = jnp.where(peaks, sm, neg)


@functools.partial(
    jax.jit, static_argnames=("fcfg", "rcfg", "interpret")
)
def cen2019_scores_pallas(
    power: jnp.ndarray,
    fcfg: FeatureConfig,
    rcfg: RadarConfig,
    interpret: bool = False,
) -> jnp.ndarray:
    """(NA, NBp) power -> (NA, NBp) peak score map (s_smooth at peaks, -inf
    elsewhere), equivalent to the XLA pipeline in ops.cen2019.cen2019_features
    up to its _finalize_topk input."""
    import numpy as _np

    radius = max(1, int(3 * fcfg.smooth_sigma_bins))
    x = _np.arange(-radius, radius + 1, dtype=_np.float64)
    k = _np.exp(-0.5 * (x / fcfg.smooth_sigma_bins) ** 2)
    k = k / k.sum()
    taps = tuple(float(v) for v in k[radius:])  # center + one-sided

    NA, NBp = power.shape
    return pl.pallas_call(
        functools.partial(
            _kernel, taps=taps, min_bin=fcfg.min_range_bins,
            nb=rcfg.num_range_bins, zq=fcfg.peak_zq,
        ),
        out_shape=jax.ShapeDtypeStruct((NA, NBp), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=NA * NBp * (4 * len(taps) + 8 * 24 + 20),
            bytes_accessed=NA * NBp * 8,
            transcendentals=NA,
        ),
    )(power)
