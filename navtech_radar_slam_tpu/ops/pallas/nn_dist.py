"""Pallas kernel: brute-force 2-D nearest neighbours for ICP.

One kernel launch computes, for each query point, the min squared distance
and argmin index over the full target set — the inner loop of every ICP
iteration (ops/icp.py).  The (TILE_Q, Nt) distance tile lives entirely in
VMEM and is reduced in-register; coordinates are passed as separate x/y
row vectors so all arrays are lane-major, and the subtract-square form
avoids the catastrophic bf16/f32 cancellation of the |a|²+|b|²-2ab matmul
formulation at 200 m ranges (see ops/icp.py precision note).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(sx_ref, sy_ref, tx_ref, ty_ref, tvalid_ref, dmin_ref, idx_ref):
    # sx/sy: (1, TILE_Q); tx/ty/tvalid: (1, Nt); outputs (1, TILE_Q)
    sx = sx_ref[0, :][:, None]                    # (TQ, 1)
    sy = sy_ref[0, :][:, None]
    tx = tx_ref[0, :][None, :]                    # (1, Nt)
    ty = ty_ref[0, :][None, :]
    dx = sx - tx
    dy = sy - ty
    d2 = dx * dx + dy * dy                        # (TQ, Nt) in VMEM
    d2 = jnp.where(tvalid_ref[0, :][None, :] > 0.5, d2, jnp.inf)
    dmin_ref[0, :] = jnp.min(d2, axis=1)
    idx_ref[0, :] = jnp.argmin(d2, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("interpret",))
def nearest_neighbors_pallas(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """src (Nq, 2), tgt (Nt, 2), tgt_valid (Nt,) ->
    (nn_sqdist (Nq,), nn_idx (Nq,)); same contract as
    ops.icp.nearest_neighbors."""
    Nq, _ = src.shape
    Nt, _ = tgt.shape
    TILE_Q = 128
    Nqp = _round_up(Nq, TILE_Q)
    Ntp = _round_up(Nt, 128)

    sx = jnp.zeros((1, Nqp), jnp.float32).at[0, :Nq].set(src[:, 0])
    sy = jnp.zeros((1, Nqp), jnp.float32).at[0, :Nq].set(src[:, 1])
    tx = jnp.zeros((1, Ntp), jnp.float32).at[0, :Nt].set(tgt[:, 0])
    ty = jnp.zeros((1, Ntp), jnp.float32).at[0, :Nt].set(tgt[:, 1])
    tv = jnp.zeros((1, Ntp), jnp.float32).at[0, :Nt].set(
        tgt_valid.astype(jnp.float32)
    )

    grid = (Nqp // TILE_Q,)
    vmem_bytes = 4 * (TILE_Q * Ntp * 2 + 5 * max(Ntp, TILE_Q)) + 1 << 20
    dmin, idx = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((1, Nqp), jnp.float32),
            jax.ShapeDtypeStruct((1, Nqp), jnp.int32),
        ),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Ntp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Ntp), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, Ntp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE_Q), lambda i: (0, i), memory_space=pltpu.VMEM),
            ),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=5 * Nqp * Ntp,
            bytes_accessed=4 * (2 * Nqp + 3 * Ntp + 2 * Nqp),
            transcendentals=0,
        ),
    )(sx, sy, tx, ty, tv)
    return dmin[0, :Nq], idx[0, :Nq]
