"""Trajectory evaluation (ATE / RTE) and run statistics.

The reference validates only visually (SURVEY §4/§6); these are the
quantitative metrics BASELINE.md requires: ATE RMSE against a reference
trajectory (with SE(2) alignment), relative translational error, loop
recall accounting."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


def align_se2(est_xy: np.ndarray, ref_xy: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Umeyama-style rigid SE(2) alignment of est onto ref (no scale).
    Returns (R (2,2), t (2,))."""
    ce = est_xy.mean(0)
    cr = ref_xy.mean(0)
    H = (est_xy - ce).T @ (ref_xy - cr)
    U, _, Vt = np.linalg.svd(H)
    D = np.diag([1.0, np.sign(np.linalg.det(Vt.T @ U.T))])
    R = Vt.T @ D @ U.T
    t = cr - R @ ce
    return R, t


def ate_rmse(est_xy: np.ndarray, ref_xy: np.ndarray, align: bool = True) -> float:
    """ATE RMSE (m) between matched xy trajectories."""
    est_xy = np.asarray(est_xy, np.float64)
    ref_xy = np.asarray(ref_xy, np.float64)
    n = min(len(est_xy), len(ref_xy))
    est_xy, ref_xy = est_xy[:n], ref_xy[:n]
    if align and n >= 2:
        R, t = align_se2(est_xy, ref_xy)
        est_xy = est_xy @ R.T + t
    return float(np.sqrt(((est_xy - ref_xy) ** 2).sum(-1).mean()))


def rte(est_xy: np.ndarray, ref_xy: np.ndarray, delta: int = 10) -> float:
    """Mean relative translational error over windows of `delta` poses."""
    est_xy = np.asarray(est_xy, np.float64)
    ref_xy = np.asarray(ref_xy, np.float64)
    n = min(len(est_xy), len(ref_xy))
    if n <= delta:
        return float("nan")
    de = est_xy[delta:n] - est_xy[: n - delta]
    dr = ref_xy[delta:n] - ref_xy[: n - delta]
    return float(np.linalg.norm(de - dr, axis=1).mean())


def path_length(xy: np.ndarray) -> float:
    xy = np.asarray(xy, np.float64)
    return float(np.sum(np.linalg.norm(np.diff(xy, axis=0), axis=1)))


def loop_recall_precision(
    loop_pairs,
    gt_kf_xy: np.ndarray,
    dist_thresh: float = 5.0,
    min_separation: int = 30,
) -> Tuple[float, float]:
    """Loop-closure recall and precision against ground-truth revisits
    (BASELINE config 2's metric; the reference never measures this).

    A keyframe j is a ground-truth *revisit* if some earlier keyframe
    i <= j - min_separation lies within dist_thresh meters of it.  An
    accepted loop (i, j) is *correct* if the two keyframes' true positions
    are within dist_thresh.

    loop_pairs: iterable of (prev_idx, curr_idx); gt_kf_xy: (N, 2) true
    keyframe positions.  Returns (recall, precision); recall is NaN when the
    trajectory contains no revisits, precision NaN with no accepted loops."""
    gt_kf_xy = np.asarray(gt_kf_xy, np.float64)
    n = len(gt_kf_xy)
    d = np.linalg.norm(gt_kf_xy[None, :] - gt_kf_xy[:, None], axis=-1)
    ii = np.arange(n)
    sep_ok = (ii[None, :] - ii[:, None]) >= min_separation   # i row, j col
    gt_pair = (d < dist_thresh) & sep_ok
    revisit = gt_pair.any(axis=0)                            # per j

    detected = np.zeros(n, bool)
    correct = 0
    total = 0
    for i, j in loop_pairs:
        i, j = int(i), int(j)
        total += 1
        if 0 <= i < n and 0 <= j < n and d[i, j] < dist_thresh:
            correct += 1
            detected[j] = True
    num_revisits = int(revisit.sum())
    recall = float("nan") if num_revisits == 0 else (
        float((detected & revisit).sum()) / num_revisits
    )
    precision = float("nan") if total == 0 else correct / total
    return recall, precision


@dataclass
class RunStats:
    num_scans: int = 0
    num_keyframes: int = 0
    num_loops: int = 0
    odometry_failures: int = 0
    ate_rmse: Optional[float] = None
    rte: Optional[float] = None
    frames_per_sec: Optional[float] = None

    def summary(self) -> str:
        parts = [
            f"scans={self.num_scans}",
            f"keyframes={self.num_keyframes}",
            f"loops={self.num_loops}",
            f"odom_failures={self.odometry_failures}",
        ]
        if self.ate_rmse is not None:
            parts.append(f"ATE={self.ate_rmse:.3f}m")
        if self.rte is not None:
            parts.append(f"RTE={self.rte:.3f}m")
        if self.frames_per_sec is not None:
            parts.append(f"{self.frames_per_sec:.2f} scans/s")
        return " ".join(parts)
