"""Branchless linear interpolation over inventory grids.

Replaces the reference's per-point bisection + tolerance snapping
(``StorageHelper.BisectInventorySpace``, StorageHelper.cs:280-314, and
``LsmcStorageValuation.InterpolateContinuationValue``, :807-826) with
searchsorted + gather, which vectorises over grid points, decisions and
simulations on the VPU.
"""
from __future__ import annotations

import jax.numpy as jnp


def interp_weights(grid, x):
    """Lower index and lerp weight for values ``x`` on sorted 1-D ``grid`` [G].

    Returns (idx_lo [x.shape], w_hi [x.shape]) with x clamped to the grid range;
    a degenerate grid (all equal) yields weight 0 on index 0.
    """
    g = grid.shape[0]
    xc = jnp.clip(x, grid[0], grid[g - 1])
    idx_lo = jnp.clip(jnp.searchsorted(grid, xc, side="right") - 1, 0, g - 2)
    lo = grid[idx_lo]
    hi = grid[idx_lo + 1]
    span = hi - lo
    w_hi = jnp.where(span > 0, (xc - lo) / jnp.where(span > 0, span, 1.0), 0.0)
    return idx_lo, w_hi


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
