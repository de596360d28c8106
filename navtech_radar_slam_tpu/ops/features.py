"""Feature descriptors and matching (+ Cartesian rendering utilities).

The reference's front-end (upstream yeti design, SURVEY §1 L1 step 3) computes
ORB descriptors on an OpenCV-rendered Cartesian radar image and matches them
with brute-force Hamming distance.  Binary descriptors and Hamming popcount
are a poor fit for the MXU, so the TPU-native redesign is:

  * **constellation descriptors** (the production path): each feature's
    neighbourhood of other features soft-splatted into a radially-aligned
    histogram — exactly rotation invariant, robust to radar's sub-pixel blob
    structure, built from one (K, K) pairwise pass + a flat scatter;
  * matching = a single (K, D) @ (D, K) correlation matmul on the MXU with
    mutual-nearest + Lowe ratio gating — the brute-force matcher the
    reference runs on CPU becomes one fused matmul + argmax;
  * polar -> Cartesian bilinear rendering and radially-aligned image-patch
    descriptors are kept as utilities (visualization, experimentation).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from navtech_radar_slam_tpu.config import FeatureConfig, RadarConfig



def polar_to_cartesian(
    power: jnp.ndarray, fcfg: FeatureConfig, rcfg: RadarConfig
) -> jnp.ndarray:
    """Render (S, S) Cartesian image from (NA, NB) polar power by bilinear
    sampling; x right, y down-range of azimuth 0, sensor at center."""
    S = fcfg.cart_size
    na = rcfg.num_azimuths
    res = fcfg.cart_resolution

    ij = (jnp.arange(S, dtype=jnp.float32) - S / 2 + 0.5) * res
    x = ij[None, :]                      # columns -> x
    y = ij[:, None]                      # rows -> y
    r = jnp.sqrt(x * x + y * y)
    theta = jnp.mod(jnp.arctan2(y, x), 2.0 * jnp.pi)

    az_f = theta / (2.0 * jnp.pi) * na - 0.5
    rb_f = r / rcfg.range_resolution - 0.5

    a0 = jnp.floor(az_f).astype(jnp.int32)
    r0 = jnp.floor(rb_f).astype(jnp.int32)
    wa = az_f - a0.astype(jnp.float32)
    wr = rb_f - r0.astype(jnp.float32)

    a0m = jnp.mod(a0, na)
    a1m = jnp.mod(a0 + 1, na)
    in_range = (r0 >= 0) & (r0 + 1 < rcfg.num_range_bins)
    r0c = jnp.clip(r0, 0, rcfg.num_range_bins - 1)
    r1c = jnp.clip(r0 + 1, 0, rcfg.num_range_bins - 1)

    v00 = power[a0m, r0c]
    v01 = power[a0m, r1c]
    v10 = power[a1m, r0c]
    v11 = power[a1m, r1c]
    out = (
        v00 * (1 - wa) * (1 - wr)
        + v01 * (1 - wa) * wr
        + v10 * wa * (1 - wr)
        + v11 * wa * wr
    )
    return jnp.where(in_range, out, 0.0)


def _bilinear_sample(img: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Sample img[(v, u)] bilinearly; u = column (x), v = row (y). Zero pad."""
    S = img.shape[0]
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    du = u - u0.astype(jnp.float32)
    dv = v - v0.astype(jnp.float32)
    ok = (u0 >= 0) & (u0 + 1 < S) & (v0 >= 0) & (v0 + 1 < S)
    u0c = jnp.clip(u0, 0, S - 1)
    u1c = jnp.clip(u0 + 1, 0, S - 1)
    v0c = jnp.clip(v0, 0, S - 1)
    v1c = jnp.clip(v0 + 1, 0, S - 1)
    out = (
        img[v0c, u0c] * (1 - du) * (1 - dv)
        + img[v0c, u1c] * du * (1 - dv)
        + img[v1c, u0c] * (1 - du) * dv
        + img[v1c, u1c] * du * dv
    )
    return jnp.where(ok, out, 0.0)


def patch_descriptors(
    cart: jnp.ndarray, xy: jnp.ndarray, fcfg: FeatureConfig
) -> jnp.ndarray:
    """(K, patch²) normalized intensity patches at metric feature locations.

    Patches are sampled in each feature's **radial frame** (axes aligned
    with the feature's bearing from the sensor): a scan rotation rotates
    the image, the feature position, and the bearing together, so the
    sampled patch is exactly invariant to sensor rotation — the TPU-native
    replacement for ORB's orientation normalization (upstream yeti design),
    at zero extra cost (the sampling grid is rotated before the gather).

    xy: (K, 2) sensor-frame meters (from ops.cen2019.features_to_xy)."""
    S = fcfg.cart_size
    P = fcfg.patch_size
    res = fcfg.cart_resolution
    u = xy[:, 0] / res + S / 2 - 0.5
    v = xy[:, 1] / res + S / 2 - 0.5

    offs = jnp.arange(P, dtype=jnp.float32) - (P - 1) / 2.0
    du, dv = jnp.meshgrid(offs, offs, indexing="xy")
    du = du.reshape(-1)[None, :]                  # (1, P²)
    dv = dv.reshape(-1)[None, :]
    # rotate the sampling grid into the radial frame of each feature
    rng = jnp.linalg.norm(xy, axis=-1)
    c = jnp.where(rng > 1e-6, xy[:, 0] / jnp.maximum(rng, 1e-6), 1.0)[:, None]
    s = jnp.where(rng > 1e-6, xy[:, 1] / jnp.maximum(rng, 1e-6), 0.0)[:, None]
    du_r = c * du - s * dv
    dv_r = s * du + c * dv
    uu = u[:, None] + du_r                        # (K, P²)
    vv = v[:, None] + dv_r
    patches = _bilinear_sample(cart, uu, vv)

    patches = patches - jnp.mean(patches, axis=1, keepdims=True)
    norm = jnp.linalg.norm(patches, axis=1, keepdims=True)
    return patches / jnp.maximum(norm, 1e-6)


def constellation_descriptors(
    xy: jnp.ndarray,
    power: jnp.ndarray,
    valid: jnp.ndarray,
    fcfg: FeatureConfig,
) -> jnp.ndarray:
    """Point-set "constellation" descriptors: (K, desc_grid²).

    For each feature, soft-splat its neighbouring features (within a
    desc_window-meter square, weighted by power and a radial falloff) into a
    desc_grid x desc_grid histogram expressed in the feature's **radial
    frame** (x-axis = bearing from sensor).  Properties:

      * exactly invariant to sensor rotation (bearing rotates with the scan);
      * robust to the sub-pixel blob structure that defeats image patches —
        radar features are sparse points, so the discriminative signal is
        the *constellation* of neighbours, not local image texture;
      * one (K, K) pairwise pass + a single flat scatter-add: MXU/VPU work,
        no gathers into image memory.

    This replaces the reference front-end's ORB descriptors (upstream yeti
    design, SURVEY §1 L1 step 3) with something radar-appropriate; matching
    stays a single correlation matmul (match_features)."""
    K = xy.shape[0]
    P = fcfg.desc_grid
    cell = fcfg.desc_window / P

    delta = xy[None, :, :] - xy[:, None, :]            # (K_center, K_nbr, 2)
    rngs = jnp.linalg.norm(xy, axis=-1)
    c = jnp.where(rngs > 1e-6, xy[:, 0] / jnp.maximum(rngs, 1e-6), 1.0)
    s = jnp.where(rngs > 1e-6, xy[:, 1] / jnp.maximum(rngs, 1e-6), 0.0)
    # rotate each center's neighbourhood into its radial frame
    dx = c[:, None] * delta[..., 0] + s[:, None] * delta[..., 1]
    dy = -s[:, None] * delta[..., 0] + c[:, None] * delta[..., 1]

    gx = dx / cell + P / 2 - 0.5
    gy = dy / cell + P / 2 - 0.5

    w = (valid[None, :] & valid[:, None]).astype(jnp.float32)
    w = w * power[None, :]
    # mild radial falloff keeps distant in-window neighbours from dominating
    w = w * jnp.exp(-0.5 * (dx * dx + dy * dy) / (fcfg.desc_window * 0.5) ** 2)

    # Bilinear splat as a *separable hat basis* contracted on the MXU:
    # max(0, 1 - |g - p|) over cell centers p reproduces exactly the two
    # bilinear tap weights (and zero outside the grid), so
    #   desc[i, y, x] = sum_j w_ij * hat_y(gy_ij)[y] * hat_x(gx_ij)[x]
    # is one batched (P, K) @ (K, P) matmul per center.  A scatter-add
    # formulation of the same splat serializes on duplicate indices on TPU
    # (measured 37.6 ms vs sub-ms for this contraction on v5e).
    cells = jnp.arange(P, dtype=jnp.float32)
    bx = jnp.maximum(0.0, 1.0 - jnp.abs(gx[..., None] - cells))   # (K, K, P)
    by = jnp.maximum(0.0, 1.0 - jnp.abs(gy[..., None] - cells))
    desc = jnp.einsum(
        "ijp,ijq->ipq", by * w[..., None], bx,
        preferred_element_type=jnp.float32,
    ).reshape(K, P * P)
    desc = desc - jnp.mean(desc, axis=1, keepdims=True)
    norm = jnp.linalg.norm(desc, axis=1, keepdims=True)
    return desc / jnp.maximum(norm, 1e-6)


class MatchSet(NamedTuple):
    """Fixed-size matched correspondence set between two scans."""

    src_xy: jnp.ndarray    # (M, 2) prev-scan points (sensor frame, m)
    dst_xy: jnp.ndarray    # (M, 2) curr-scan points
    src_range: jnp.ndarray  # (M,) range of src points (for anisotropic noise)
    dst_range: jnp.ndarray  # (M,)
    weight: jnp.ndarray    # (M,) match confidence in [0, 1]
    valid: jnp.ndarray     # (M,) bool
    #: sweep fractions of the matched rays (for in-place de-skew of the
    #: correspondence set, models.odometry.deskew_matches); None when the
    #: producer has no ray timing (e.g. synthetic test sets)
    src_frac: jnp.ndarray = None   # (M,)
    dst_frac: jnp.ndarray = None   # (M,)


def match_features(
    desc_a: jnp.ndarray,
    desc_b: jnp.ndarray,
    xy_a: jnp.ndarray,
    xy_b: jnp.ndarray,
    valid_a: jnp.ndarray,
    valid_b: jnp.ndarray,
    fcfg: FeatureConfig,
    frac_a: jnp.ndarray = None,
    frac_b: jnp.ndarray = None,
) -> MatchSet:
    """Mutual-nearest + ratio-gated matches via one correlation matmul.

    Replaces the reference's brute-force Hamming matcher: C = Da @ Db^T is a
    (K, K) MXU matmul; mutual argmax + Lowe ratio run as reductions."""
    C = jnp.dot(
        desc_a, desc_b.T, preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    neg = jnp.float32(-2.0)
    C = jnp.where(valid_a[:, None] & valid_b[None, :], C, neg)

    best_j = jnp.argmax(C, axis=1)                       # (K,)
    best_c = jnp.max(C, axis=1)
    # second-best for ratio test
    C_wo = C.at[jnp.arange(C.shape[0]), best_j].set(neg)
    second_c = jnp.max(C_wo, axis=1)
    best_i_of_j = jnp.argmax(C, axis=0)                  # (K,)
    mutual = best_i_of_j[best_j] == jnp.arange(C.shape[0])

    # Lowe ratio on correlation distance (1 - c)
    d1 = 1.0 - best_c
    d2 = 1.0 - second_c
    ratio_ok = d1 < fcfg.ratio_test * d2
    good = mutual & ratio_ok & valid_a & (best_c > neg + 1.0)

    score = jnp.where(good, best_c, neg)
    M = fcfg.max_matches
    top_score, top_i = jax.lax.top_k(score, M)
    sel_j = best_j[top_i]
    m_valid = top_score > neg + 1.0

    src = xy_a[top_i]
    dst = xy_b[sel_j]
    return MatchSet(
        src_xy=jnp.where(m_valid[:, None], src, 0.0),
        dst_xy=jnp.where(m_valid[:, None], dst, 0.0),
        src_range=jnp.linalg.norm(src, axis=-1) * m_valid,
        dst_range=jnp.linalg.norm(dst, axis=-1) * m_valid,
        weight=jnp.where(m_valid, jnp.clip(top_score, 0.0, 1.0), 0.0),
        valid=m_valid,
        src_frac=None if frac_a is None else frac_a[top_i] * m_valid,
        dst_frac=None if frac_b is None else frac_b[sel_j] * m_valid,
    )
