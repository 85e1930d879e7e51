"""Least-squares regression for the LSMC continuation values.

The reference computes a thin-QR pseudo-inverse of the design matrix with MKL
per backward step (``LsmcStorageValuation.cs:192-197``), which does not shard.
The TPU-native formulation standardises the basis columns (the normalisation
the reference lists as a TODO at LsmcStorageValuation.cs:189) and solves the
normal equations with a Cholesky factorisation:

    X_std = (X - mean) / std          (column 0, the constant, untouched)
    M     = X_stdᵀ X_std  (+ ridge jitter)     — psum across path shards
    c     = M⁻¹ X_stdᵀ Y                        — Y = [S, G] continuation values

Both cross-shard reductions are tiny ([B,B] and [B,G], B ≈ 10), so path
sharding scales; every shard then solves the same small system redundantly,
which is cheaper than sharding the solve.
"""
from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp


def _psum(x, axis_name: tp.Optional[str]):
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def column_stats(x, axis_name: tp.Optional[str] = None):
    """Global mean/std of design-matrix columns [S, B] across path shards.

    The constant column (index 0) keeps mean 0 / std 1 so standardisation
    leaves it intact.
    """
    s_local = x.shape[0]
    count = _psum(jnp.asarray(s_local, x.dtype), axis_name)
    col_sum = _psum(jnp.sum(x, axis=0), axis_name)
    mean = col_sum / count
    col_sq = _psum(jnp.sum((x - mean) ** 2, axis=0), axis_name)
    std = jnp.sqrt(col_sq / count)
    std = jnp.where(std > 0, std, 1.0)
    b = x.shape[1]
    first = jnp.arange(b) == 0
    mean = jnp.where(first, 0.0, mean)
    std = jnp.where(first, 1.0, std)
    return mean, std


def standardise(x, mean, std):
    return (x - mean) / std


def fit_continuation(
    x_std,
    y,
    axis_name: tp.Optional[str] = None,
    ridge: tp.Optional[float] = None,
):
    """Regression coefficients for standardised design matrix.

    ``x_std``: [S, B]; ``y``: [S, G] (continuation values per sim for each next
    inventory grid point).  Returns coeffs [B, G].  The ridge jitter is scaled
    by mean(diag(M)) to keep the solve well-posed under exactly collinear bases
    (the reference QR simply fails there — README.md:747-751 notes QR dominates
    its runtime; here the [B,B] solve is negligible next to the [B,S] matmuls).

    Near the valuation date the simulated spot is an almost-deterministic
    function of the factors, so the sample correlation of the basis columns is
    singular to within f32 resolution; the default ridge is therefore larger in
    f32 (1e-5) than f64 (1e-7), and a failed Cholesky (non-finite coefficients)
    falls back to the projection on the constant column — the cross-sim mean —
    instead of poisoning the backward scan with NaNs.
    """
    # precision=HIGHEST: TPU matmuls default to bf16 operand precision, which
    # is too coarse for the normal-equation moments that set decision quality.
    m = _psum(
        jnp.dot(
            x_std.T, x_std,
            preferred_element_type=x_std.dtype,
            precision=jax.lax.Precision.HIGHEST,
        ),
        axis_name,
    )
    xty = _psum(
        jnp.dot(
            x_std.T, y,
            preferred_element_type=x_std.dtype,
            precision=jax.lax.Precision.HIGHEST,
        ),
        axis_name,
    )
    return fit_from_moments(m, xty, ridge)


def standardise_moments(xtx_raw, xty_raw):
    """Standardised normal-equation system from RAW moments.

    Given ``xtx_raw = XᵀX`` [B, B] and ``xty_raw = XᵀY`` [B, G] of the raw
    design matrix (column 0 all-ones), returns ``(m, xty, mean, std)`` of the
    column-standardised system — algebraically identical to standardising X
    first (two-pass ``column_stats``), derived from the moments alone:

        n = XᵀX[0,0]; μ = XᵀX[0,:]/n; var = diag(XᵀX)/n − μ²
        X̃ᵀX̃ = D⁻¹(XᵀX − n μμᵀ)D⁻¹;  X̃ᵀY = D⁻¹(XᵀY − μ·(XᵀY)[0,:])

    The one-pass variance subtraction can cancel catastrophically in f32 when
    a column is nearly deterministic; a wrong-but-positive std only rescales
    the solve (predictions are invariant to the scaling as long as the same
    mean/std standardise the design matrix), and the ridge + Cholesky
    fallback in ``fit_from_moments`` covers genuine singularity, so var is
    simply clamped at zero.
    """
    b = xtx_raw.shape[0]
    n = xtx_raw[0, 0]
    # True column means — mu_true[0] == 1 (the constant column), which is
    # what the bilinear subtraction needs so that row/column 0 of the
    # standardised Gram matrix comes out exactly 0 (X̃_0 stays the raw
    # constant, every other X̃_j has mean 0).
    mu_true = xtx_raw[0] / n
    ex2 = jnp.diagonal(xtx_raw) / n
    first = jnp.arange(b) == 0
    mean = jnp.where(first, 0.0, mu_true)
    var = ex2 - mean**2
    std = jnp.sqrt(jnp.maximum(var, 0.0))
    std = jnp.where(std > 0, std, 1.0)
    std = jnp.where(first, 1.0, std)
    m = (xtx_raw - n * mu_true[:, None] * mu_true[None, :]) / (
        std[:, None] * std[None, :]
    )
    # [0, 0] = n - n·1·1 under the subtraction; the constant column's true
    # sum of squares is n.
    m = m.at[0, 0].set(n)
    xty = (xty_raw - mean[:, None] * xty_raw[0:1, :]) / std[:, None]
    return m, xty, mean, std


def fit_from_moments(m, xty, ridge: tp.Optional[float] = None):
    """Solve the standardised normal equations given assembled moments
    (``m = X̃ᵀX̃`` [B, B], ``xty = X̃ᵀY`` [B, G]) — the shared tail of
    ``fit_continuation``: trace-scaled ridge jitter, Cholesky, and the
    constant-column fallback on a failed solve."""
    if ridge is None:
        ridge = 1e-5 if m.dtype == jnp.float32 else 1e-7
    b = m.shape[0]
    jitter = ridge * jnp.trace(m) / b
    m = m + jitter * jnp.eye(b, dtype=m.dtype)
    chol, lower = jax.scipy.linalg.cho_factor(m, lower=True)
    coeffs = jax.scipy.linalg.cho_solve((chol, lower), xty)
    # m[0, 0] is the constant column's sum of squares = the global sim count.
    mean_y = xty[0:1] / m[0, 0]
    fallback = jnp.concatenate([mean_y, jnp.zeros_like(xty[1:])], axis=0)
    solve_failed = ~jnp.all(jnp.isfinite(coeffs))
    return jnp.where(solve_failed, fallback, coeffs)


def predict(x_std, coeffs):
    """Fitted continuation values [S, G] = X_std @ coeffs.

    HIGH precision (bf16 x 3 passes ~ f32): continuation values feed an argmax
    whose errors behave like extra MC noise, so full HIGHEST passes are not
    worth the cost on this [S, B] x [B, G] hot matmul.
    """
    return jnp.dot(
        x_std, coeffs,
        preferred_element_type=x_std.dtype,
        precision=jax.lax.Precision.HIGH,
    )
