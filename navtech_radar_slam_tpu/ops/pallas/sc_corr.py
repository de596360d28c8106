"""Pallas kernel: ScanContext all-shift correlation over the bank.

Fuses the two matmuls of ops.scancontext.sc_distance_all_shifts — the
cosine-mass correlation (bank x rolled-query) and the valid-column count —
with the masked normalization into one VMEM-resident pass per bank tile:

    dist[n, s] = 1 - C[n, s] / max(count[n, s], 1)

The reference's equivalent is a scalar C++ triple loop per candidate
(Scancontext.cpp:69-148) behind a KD-tree prefilter; here the entire padded
bank (max_keyframes) is scored against all 60 shifts in one kernel launch —
MXU matmuls on a (TILE_N, R*S) x (R*S, S_pad) contraction.

Shapes are padded to lane multiples on the host wrapper: the (R*S = 1200)
contraction dim to 1280, the 60 shifts to 128 (inf-masked).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(bank_ref, bnz_ref, qroll_ref, qnz_ref, dist_ref):
    # bank_ref: (TILE_N, Kp)   flattened normalized descriptors
    # bnz_ref:  (TILE_N, Sp)   per-column nonzero mask (cols padded)
    # qroll_ref:(Kp, Zp)       rolled normalized query, transposed
    # qnz_ref:  (Sp, Zp)       rolled query column-mask, transposed
    # dist_ref: (TILE_N, Zp)
    C = jnp.dot(
        bank_ref[:], qroll_ref[:], preferred_element_type=jnp.float32
    )
    counts = jnp.dot(
        bnz_ref[:], qnz_ref[:], preferred_element_type=jnp.float32
    )
    dist = 1.0 - C / jnp.maximum(counts, 1.0)
    dist_ref[:] = jnp.where(counts > 0.5, dist, 1.0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def sc_shift_distances_pallas(
    query: jnp.ndarray, bank: jnp.ndarray, interpret: bool = False
) -> jnp.ndarray:
    """(R, S) query vs (N, R, S) bank -> (N, S) distance per circular shift.

    Same semantics as the distance matrix inside
    ops.scancontext.sc_distance_all_shifts (min/argmin over axis -1 give the
    best shift); callers pick candidates from the returned matrix."""
    N, R, S = bank.shape
    K = R * S
    Kp = _round_up(K, 128)
    Zp = _round_up(S, 128)
    TILE_N = 256 if N >= 256 else _round_up(N, 8)

    def normalize_cols(d):
        norm = jnp.linalg.norm(d, axis=-2, keepdims=True)
        nz = norm[..., 0, :] > 1e-9
        return d / jnp.maximum(norm, 1e-9), nz

    qn, qnz = normalize_cols(query)
    bn, bnz = normalize_cols(bank)

    # rolled copies of the query: roll z matches bank column c with query
    # column (z + c) mod S
    col_idx = jnp.mod(
        jnp.arange(S)[None, :] + jnp.arange(S)[:, None], S
    )  # (Z, C)
    q_rolled = qn[:, col_idx]                      # (R, Z, C)
    q_flat = jnp.moveaxis(q_rolled, 1, 0).reshape(S, K)   # (Z, K)
    qnz_rolled = qnz[col_idx]                      # (Z, C)

    Np = _round_up(N, TILE_N)
    bank_flat = jnp.zeros((Np, Kp), jnp.float32).at[:N, :K].set(
        bn.reshape(N, K)
    )
    bnz_flat = jnp.zeros((Np, Zp), jnp.float32).at[:N, :S].set(
        bnz.astype(jnp.float32)
    )
    qroll_T = jnp.zeros((Kp, Zp), jnp.float32).at[:K, :S].set(q_flat.T)
    qnz_T = jnp.zeros((Zp, Zp), jnp.float32).at[:S, :S].set(
        qnz_rolled.astype(jnp.float32).T
    )

    grid = (Np // TILE_N,)
    dist = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct((Np, Zp), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE_N, Kp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((TILE_N, Zp), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Kp, Zp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((Zp, Zp), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((TILE_N, Zp), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=2 * Np * Kp * Zp + 2 * Np * Zp * Zp,
            bytes_accessed=4 * (Np * Kp + Kp * Zp + Np * Zp),
            transcendentals=0,
        ),
    )(bank_flat, bnz_flat, qroll_T, qnz_T)
    return dist[:N, :S]
