"""Pallas TPU kernels for the hot compute paths.

Each kernel has an XLA reference implementation in ops/ (used for autodiff,
CPU tests, and as the ground truth in parity tests).  Kernels run compiled
on TPU and in interpreter mode elsewhere, so the same code path is testable
on the CPU mesh."""

import os

import jax

from navtech_radar_slam_tpu.ops.pallas.sc_corr import sc_shift_distances_pallas  # noqa: F401
from navtech_radar_slam_tpu.ops.pallas.nn_dist import nearest_neighbors_pallas  # noqa: F401


def should_use_pallas() -> bool:
    """Trace-time dispatch: compiled kernels on TPU, XLA elsewhere.
    Set NRS_DISABLE_PALLAS=1 to force the XLA paths (debugging)."""
    if os.environ.get("NRS_DISABLE_PALLAS") == "1":
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
