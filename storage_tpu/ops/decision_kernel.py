"""Fused Pallas TPU kernel for the LSMC backward decision update.

The backward step's hot loop (reference ``LsmcStorageValuation.cs:240-338``)
evaluates, for every (inventory grid point g, decision d, simulation s):

    val_reg[g,d,s] = immediate_pv[g,d](spot[s]) + regressed_continuation[g,d,s]
    val_act[g,d,s] = immediate_pv[g,d](spot[s]) + actual_continuation[g,d,s]
    best_act[g,s]  = val_act[g, argmax_d val_reg[g,d,s], s]

A straightforward XLA lowering materialises several [G, D, S] temporaries in
HBM (~315 MB each at the benchmark config), making the step HBM-bound.  This
kernel streams simulations through VMEM in tiles and keeps every [G, D, S_tile]
intermediate on-chip, so per step the only HBM traffic is reading
``v_act_next`` [G, S] and the design matrix [B, S] and writing ``best_act``
[G, S] — a ~5-10x traffic reduction.

Both continuations become MXU matmuls on the tile:

* actual:    ``W[d] @ v_tile``   where ``W[d]`` [G, G] holds the two linear
  interpolation hat weights per row (linear interpolation in inventory as a
  sparse-in-dense matrix — gathers along the sublane axis are slow on TPU);
* regressed: ``ci[d] @ dm_tile`` where ``ci[d]`` [G, B] are the regression
  coefficients pre-interpolated to each (g, d) target inventory (linear
  interpolation commutes with the linear model).

The running argmax matches the reference's anti-foresight trick: argmax on
REGRESSED values while realising ACTUAL values, first decision wins ties
(LsmcStorageValuation.cs:310-336).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Simulation-tile width: lane-dim multiple of 128; 1024 keeps the per-tile
# working set (~3 MB at G=100, D=3) comfortably inside VMEM double-buffered.
_TILE_CANDIDATES = (1024, 512, 256, 128)


def _split_bf16(x):
    """Split f32 into (hi, lo) bf16 parts with x ~ hi + lo exactly to ~2^-16."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a_hi, a_lo, b_hi, b_lo):
    """Split-precision matmul: 3 native-bf16 MXU passes reconstructing ~f32
    accuracy (drops only the lo x lo cross term, ~2^-16 relative).  Measured
    27% faster end-to-end than XLA's 6-pass HIGHEST f32 emulation with NPV
    agreement to 4e-6 relative at the benchmark config.  The 2-pass variant
    (dropping a_lo entirely) is NOT safe: it degraded forward NPV by ~1.6%
    (18 MC standard errors) — backward induction compounds interpolation
    noise through 365 argmax steps."""
    f32 = jnp.float32
    return (
        jnp.dot(a_hi, b_hi, preferred_element_type=f32)
        + jnp.dot(a_hi, b_lo, preferred_element_type=f32)
        + jnp.dot(a_lo, b_hi, preferred_element_type=f32)
    )


def _kernel(v_ref, dm_ref, spot_ref, w_ref, ci_ref, a_ref, b_ref, out_ref,
            *, num_decisions: int):
    v = v_ref[...]        # [G, St] actual next-period values
    dm = dm_ref[...]      # [B, St] standardised design matrix (transposed)
    spot = spot_ref[...]  # [1, St]
    v_hi, v_lo = _split_bf16(v)
    dm_hi, dm_lo = _split_bf16(dm)

    best_reg = None
    best_act = None
    for d in range(num_decisions):
        # Actual continuation: linear interp in inventory as an MXU matmul —
        # this is the value function carried across all backward steps, so it
        # needs ~f32 fidelity (see _dot3 note on the failed 2-pass variant).
        w_hi, w_lo = _split_bf16(w_ref[d])
        c_act = _dot3(w_hi, w_lo, v_hi, v_lo)  # [G, St]
        # Regressed continuation at the (g, d) target inventory.  This drives
        # the decision ARGMAX, which on a lower-bound estimator must also stay
        # near-f32: single-pass bf16 here systematically biases NPV down ~1.4%
        # (misselected decisions only ever lose value).
        ci_hi, ci_lo = _split_bf16(ci_ref[d])
        pred = _dot3(ci_hi, ci_lo, dm_hi, dm_lo)  # [G, St]
        imm = a_ref[d] * spot + b_ref[d]  # [G, 1] x [1, St] -> [G, St]
        vr = pred + imm
        va = c_act + imm
        if d == 0:
            best_reg, best_act = vr, va
        else:
            better = vr > best_reg
            best_reg = jnp.where(better, vr, best_reg)
            best_act = jnp.where(better, va, best_act)
    out_ref[...] = best_act


def pick_sim_tile(num_sims: int) -> int:
    for t in _TILE_CANDIDATES:
        if num_sims % t == 0:
            return t
    return 0  # no aligned tile — caller falls back to the XLA path


@functools.partial(jax.jit, static_argnames=("sim_tile", "interpret"))
def decision_update_pallas(
    v_act_next: jnp.ndarray,  # [G, S] f32
    dm_std_t: jnp.ndarray,    # [B, S] f32
    spot: jnp.ndarray,        # [S] f32
    w: jnp.ndarray,           # [D, G, G] interp-weight matrices
    ci: jnp.ndarray,          # [D, G, B] interpolated regression coeffs
    a: jnp.ndarray,           # [D, G] immediate-pv spot coefficient
    b: jnp.ndarray,           # [D, G] immediate-pv constant
    sim_tile: int,
    interpret: bool = False,
) -> jnp.ndarray:
    g, s = v_act_next.shape
    b_dim = dm_std_t.shape[0]
    d = w.shape[0]
    grid = (s // sim_tile,)
    flops_per_tile = 2 * g * sim_tile * (g + b_dim) * d
    return pl.pallas_call(
        functools.partial(_kernel, num_decisions=d),
        out_shape=jax.ShapeDtypeStruct((g, s), v_act_next.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((g, sim_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_dim, sim_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sim_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, g, g), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, g, b_dim), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, g, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, g, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, sim_tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=flops_per_tile * grid[0],
            bytes_accessed=4 * s * (2 * g + b_dim + 1),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        v_act_next,
        dm_std_t,
        spot[None, :],
        w,
        ci,
        a[..., None],
        b[..., None],
    )


def interp_weight_matrix(idx_lo: jnp.ndarray, w_hi: jnp.ndarray, g_next: int,
                         dtype) -> jnp.ndarray:
    """Dense [D, G, G_next] linear-interpolation operator from per-(g, d) lower
    indices and lerp weights: row (d, g) has ``1-w`` at ``idx_lo`` and ``w`` at
    ``idx_lo + 1`` so that ``W[d] @ values`` equals clamped linear interpolation.

    Rows sum to exactly 1 (the two weights are exact f32 complements), so the
    matmul preserves constant value levels."""
    eye = jnp.eye(g_next, dtype=dtype)
    w_mat = eye[idx_lo] * (1.0 - w_hi[..., None]) + eye[idx_lo + 1] * w_hi[..., None]
    return jnp.swapaxes(w_mat, 0, 1)  # [G, D, G_next] -> [D, G, G_next]
