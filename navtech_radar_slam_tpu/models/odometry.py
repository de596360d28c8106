"""Radar odometry front-end: the capability of the ORORA node.

The reference runs odometry as a separate ROS process reading files and
publishing `/orora/odom` + `/orora/cloud_local`
(launch/navtech_radar_slam_mulran.launch:5-8, sc_pgo.launch:6-7).  Here the
whole per-scan-pair computation — cen2019 extraction, Cartesian descriptor
matching, ORORA-style robust registration — is ONE jitted function
(`odometry_step`); the host-side `RadarOdometry` class only holds the tiny
carry state (previous scan's features/descriptors and the accumulated pose).

This is the framework's flagship compute path: `make_odometry_step(cfg)`
returns the jittable (scan_pair -> relative pose) function used by
`__graft_entry__.entry()`.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from navtech_radar_slam_tpu.config import SlamConfig
from navtech_radar_slam_tpu.ops import cen2019, features, registration
from navtech_radar_slam_tpu.utils import geometry as geo


class ScanFeatures(NamedTuple):
    """Per-scan device-resident front-end state."""

    xy: jnp.ndarray        # (K, 2) sensor-frame feature positions (m)
    desc: jnp.ndarray      # (K, D) normalized patch descriptors
    power: jnp.ndarray     # (K,)
    valid: jnp.ndarray     # (K,) bool
    ranges: jnp.ndarray    # (K,) range of each feature (m)


def extract_scan_features(power: jnp.ndarray, azimuths: jnp.ndarray,
                          cfg: SlamConfig) -> ScanFeatures:
    """cen2019 peaks -> metric xy -> rotation-invariant constellation
    descriptors (ops.features.constellation_descriptors)."""
    feats = cen2019.extract_features(power, cfg.features, cfg.radar)
    xy = cen2019.features_to_xy(feats, azimuths, cfg.radar)
    desc = features.constellation_descriptors(
        xy, feats.power, feats.valid, cfg.features
    )
    return ScanFeatures(
        xy=xy,
        desc=jnp.where(feats.valid[:, None], desc, 0.0),
        power=feats.power,
        valid=feats.valid,
        ranges=jnp.linalg.norm(xy, axis=-1),
    )


def register_feature_pair(
    prev: ScanFeatures, curr: ScanFeatures, cfg: SlamConfig
) -> registration.RegistrationResult:
    matches = features.match_features(
        prev.desc, curr.desc, prev.xy, curr.xy, prev.valid, curr.valid,
        cfg.features,
    )
    return registration.register_scans(matches, cfg.registration)


def odometry_step(
    power: jnp.ndarray,
    azimuths: jnp.ndarray,
    prev: ScanFeatures,
    cfg: SlamConfig,
) -> Tuple[ScanFeatures, registration.RegistrationResult]:
    """One front-end step: extract current scan, register against previous.

    Pure function of (scan, carry) -> (carry', result); jit it once and feed
    scans — the reference's file-driven per-scan loop (SURVEY §3.5) becomes
    repeated invocation of this compiled program."""
    curr = extract_scan_features(power, azimuths, cfg)
    result = register_feature_pair(prev, curr, cfg)
    return curr, result


def make_odometry_step(cfg: SlamConfig):
    """Jitted (power, azimuths, prev_features) -> (features, result)."""
    return jax.jit(functools.partial(odometry_step, cfg=cfg))


class RadarOdometry:
    """Host-side accumulator mirroring the ORORA node's output contract:
    per scan it yields the accumulated SE(2) pose (the `/orora/odom` stream)
    and the current feature cloud (the `/orora/cloud_local` stream)."""

    def __init__(self, cfg: Optional[SlamConfig] = None):
        self.cfg = cfg or SlamConfig()
        self._step = make_odometry_step(self.cfg)
        self._extract = jax.jit(
            functools.partial(extract_scan_features, cfg=self.cfg)
        )
        self.prev: Optional[ScanFeatures] = None
        self.pose = np.zeros(3)          # accumulated [x, y, theta]
        self.num_scans = 0
        self.last_result: Optional[registration.RegistrationResult] = None
        self.last_rel = np.zeros(3)      # constant-velocity fallback
        self.num_failures = 0

    def default_azimuths(self) -> np.ndarray:
        na = self.cfg.radar.num_azimuths
        return (np.arange(na, dtype=np.float32) + 0.5) / na * 2.0 * np.pi

    def process(self, power, azimuths=None) -> Tuple[np.ndarray, ScanFeatures]:
        """Feed one polar scan; returns (accumulated pose, scan features)."""
        if azimuths is None:
            azimuths = self.default_azimuths()
        power = jnp.asarray(power)
        azimuths = jnp.asarray(azimuths)
        if self.prev is None:
            self.prev = self._extract(power, azimuths)
            self.num_scans = 1
            return self.pose.copy(), self.prev
        curr, result = self._step(power, azimuths, self.prev)
        self.last_result = result
        if bool(result.ok):
            rel = np.asarray(result.rel_pose)
            self.last_rel = rel
        else:
            # constant-velocity fallback: reuse the previous increment
            rel = self.last_rel
            self.num_failures += 1
        self.pose = np.asarray(
            geo.se2_mul(jnp.asarray(self.pose, jnp.float32),
                        jnp.asarray(rel, jnp.float32))
        ).astype(np.float64)
        self.prev = curr
        self.num_scans += 1
        return self.pose.copy(), curr
