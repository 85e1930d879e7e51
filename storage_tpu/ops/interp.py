"""Branchless linear interpolation over inventory grids.

Replaces the reference's per-point bisection + tolerance snapping
(``StorageHelper.BisectInventorySpace``, StorageHelper.cs:280-314, and
``LsmcStorageValuation.InterpolateContinuationValue``, :807-826) with
searchsorted + gather, which vectorises over grid points, decisions and
simulations on the VPU.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_positions(grid, x):
    """Fractional positions of ``x`` on a *uniform* 1-D ``grid`` [G].

    The engines' inventory grids are linspace (``grid.inventory_grids``), so
    interpolation indices come from arithmetic instead of searchsorted — the
    binary-search/gather lowering is slow on TPU.  Degenerate grids (all equal)
    map everything to position 0.
    """
    g = grid.shape[0]
    span = grid[g - 1] - grid[0]
    delta = span / (g - 1)
    safe = jnp.where(delta > 0, delta, 1.0)
    pos = (jnp.clip(x, grid[0], grid[g - 1]) - grid[0]) / safe
    return jnp.where(delta > 0, pos, 0.0)


def interp_weights(grid, x):
    """Lower index and lerp weight for values ``x`` on a uniform 1-D ``grid`` [G].

    Returns (idx_lo [x.shape], w_hi [x.shape]) with x clamped to the grid range;
    a degenerate grid (all equal) yields weight 0 on index 0.
    """
    g = grid.shape[0]
    pos = grid_positions(grid, x)
    idx_lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, g - 2)
    w_hi = jnp.clip(pos - idx_lo, 0.0, 1.0)
    return idx_lo, w_hi


def interp_per_sim(grid, values, x):
    """Linear interpolation of per-sim value rows at per-sim query points.

    ``values``: [S, G]; ``x``: [S, D] → [S, D].  Implemented as a hat-weight
    contraction over the grid axis instead of take_along_axis — per-element
    minor-axis gathers are an order of magnitude slower on TPU than this
    [S,D,G]x[S,G] einsum (full-precision passes: the values' magnitude would
    lose ~3 digits in bf16 operands).
    """
    pos = grid_positions(grid, x)  # [S, D]
    g_idx = jnp.arange(grid.shape[0], dtype=pos.dtype)
    hat = jnp.clip(1.0 - jnp.abs(pos[..., None] - g_idx), 0.0, 1.0)  # [S, D, G]
    return jnp.einsum(
        "sdg,sg->sd", hat, values, precision=jax.lax.Precision.HIGHEST
    )


def interp_columns(grid, values, x):
    """Interpolate ``values`` [G, S] along the grid axis at inventories ``x`` [...].

    Returns array of shape x.shape + (S,): per-simulation continuation values at
    each queried inventory.
    """
    idx_lo, w_hi = interp_weights(grid, x)
    lo_vals = values[idx_lo]  # x.shape + (S,)
    hi_vals = values[idx_lo + 1]
    return lo_vals + (hi_vals - lo_vals) * w_hi[..., None]


def interp_vector(grid, values, x):
    """Interpolate a 1-D ``values`` [G] at ``x`` [...] (linear, clamped)."""
    idx_lo, w_hi = interp_weights(grid, x)
    lo_vals = values[idx_lo]
    hi_vals = values[idx_lo + 1]
    return lo_vals + (hi_vals - lo_vals) * w_hi
