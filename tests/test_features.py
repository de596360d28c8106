"""Tests for the Cartesian-rendering + patch-descriptor utilities.

These are the utility half of ops/features.py (the production path —
constellation descriptors + matmul matching — is exercised through
test_odometry / test_registration).  The reference front-end renders a
Cartesian radar image and computes oriented descriptors on it (upstream
yeti design, SURVEY §1 L1 step 3); these tests pin the same capabilities:
geometric correctness of the polar->Cartesian resampling and exact
rotation invariance of the radially-aligned patch descriptors.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np

from navtech_radar_slam_tpu.config import FeatureConfig, RadarConfig
from navtech_radar_slam_tpu.ops import features


def _cart_image_from_points(pts, fcfg, sigma_px=1.5):
    """Sum-of-Gaussian-blobs Cartesian image at the config's grid."""
    S, res = fcfg.cart_size, fcfg.cart_resolution
    ij = (np.arange(S) - S / 2 + 0.5) * res
    x = ij[None, :]
    y = ij[:, None]
    img = np.zeros((S, S), np.float32)
    for px, py in pts:
        img += np.exp(
            -((x - px) ** 2 + (y - py) ** 2) / (2.0 * (sigma_px * res) ** 2)
        ).astype(np.float32)
    return jnp.asarray(img)


def test_polar_to_cartesian_places_blob():
    rcfg = RadarConfig()
    fcfg = FeatureConfig(cart_size=256, cart_resolution=1.0)

    # bright return at azimuth index a0, range r_m
    a0, r_m = 100, 60.0
    rb = int(round(r_m / rcfg.range_resolution))
    # blob must span >= the 1 m cartesian pixel pitch: +-1.2 m = +-20 bins
    polar = np.zeros((rcfg.num_azimuths, rcfg.padded_range_bins), np.float32)
    polar[a0 - 1 : a0 + 2, rb - 20 : rb + 21] = 1.0

    cart = np.asarray(features.polar_to_cartesian(jnp.asarray(polar), fcfg, rcfg))
    assert cart.shape == (fcfg.cart_size, fcfg.cart_size)

    # expected metric position: theta = (a0 + 0.5)/NA * 2pi, x = r cos, y = r sin
    theta = (a0 + 0.5) / rcfg.num_azimuths * 2.0 * np.pi
    ex, ey = r_m * np.cos(theta), r_m * np.sin(theta)
    v, u = np.unravel_index(np.argmax(cart), cart.shape)
    got_x = (u - fcfg.cart_size / 2 + 0.5) * fcfg.cart_resolution
    got_y = (v - fcfg.cart_size / 2 + 0.5) * fcfg.cart_resolution
    assert abs(got_x - ex) < 2.5 * fcfg.cart_resolution
    assert abs(got_y - ey) < 2.5 * fcfg.cart_resolution
    # energy conservation sanity: blob neither vanished nor smeared wide
    assert cart.max() > 0.5


def test_polar_to_cartesian_zero_outside_range():
    rcfg = RadarConfig()
    fcfg = FeatureConfig(cart_size=64, cart_resolution=8.0)  # 512 m square
    polar = np.ones((rcfg.num_azimuths, rcfg.padded_range_bins), np.float32)
    cart = np.asarray(features.polar_to_cartesian(jnp.asarray(polar), fcfg, rcfg))
    # corners are beyond max_range (200 m) -> bilinear gate must zero them
    assert cart[0, 0] == 0.0 and cart[-1, -1] == 0.0
    assert cart[fcfg.cart_size // 2, fcfg.cart_size // 2] > 0.0


def test_patch_descriptors_rotation_invariant(rng):
    """Rotating the whole scene (image + feature positions) must leave the
    radially-aligned patch descriptors unchanged — the property ORB gets
    from orientation normalization, exact here by construction."""
    fcfg = FeatureConfig(cart_size=256, cart_resolution=0.5, patch_size=8)

    # a constellation of scatterers; features at a subset of them
    pts = rng.uniform(-40.0, 40.0, size=(40, 2))
    feat_idx = np.arange(0, 40, 5)
    xy = pts[feat_idx]

    ang = 1.1
    c, s = np.cos(ang), np.sin(ang)
    R = np.array([[c, -s], [s, c]])
    pts_rot = pts @ R.T
    xy_rot = xy @ R.T

    img_a = _cart_image_from_points(pts, fcfg)
    img_b = _cart_image_from_points(pts_rot, fcfg)

    d_a = np.asarray(features.patch_descriptors(img_a, jnp.asarray(xy), fcfg))
    d_b = np.asarray(features.patch_descriptors(img_b, jnp.asarray(xy_rot), fcfg))

    # normalized descriptors: cosine similarity of corresponding rows
    cos = np.sum(d_a * d_b, axis=1)
    assert np.all(cos > 0.95), cos


def test_patch_descriptors_discriminate(rng):
    """Descriptors at distinct scene locations must not all collapse to the
    same vector (they carry local structure)."""
    fcfg = FeatureConfig(cart_size=256, cart_resolution=0.5, patch_size=8)
    # each feature carries a satellite scatterer at a distinct in-window
    # offset — the local structure the patch must encode
    xy = rng.uniform(-40.0, 40.0, size=(12, 2))
    sats = xy + rng.uniform(-1.8, 1.8, size=xy.shape)
    img = _cart_image_from_points(np.concatenate([xy, sats]), fcfg)
    d = np.asarray(features.patch_descriptors(img, jnp.asarray(xy), fcfg))
    C = d @ d.T
    off = C[~np.eye(len(xy), dtype=bool)]
    assert np.median(off) < 0.8


def test_patch_size_knob_sets_descriptor_dim():
    fcfg = dataclasses.replace(FeatureConfig(cart_size=64), patch_size=6)
    img = jnp.zeros((64, 64), jnp.float32)
    d = features.patch_descriptors(img, jnp.zeros((3, 2)), fcfg)
    assert d.shape == (3, 36)
