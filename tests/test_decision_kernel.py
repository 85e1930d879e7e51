"""Fused Pallas decision-update kernel: interpret-mode equivalence on CPU.

The kernel (ops/decision_kernel.py) must reproduce the pure-XLA backward
decision update exactly (same anti-foresight argmax, first decision wins
ties) — the TPU production path is validated statistically on hardware, the
kernel *logic* is pinned here via ``interpret=True``.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from storage_tpu.ops import decision_kernel
from storage_tpu.ops.interp import interp_weights


def _reference_update(v_act_next, dm_std, spot, grid_next, idx_lo, w_hi, ci, a, b):
    """The XLA path of lsmc_backward's decision loop, shapes as in the engine."""
    num_decisions = a.shape[1]
    pred = jnp.einsum("sb,bgd->gds", dm_std, ci)
    best_reg = best_act = None
    for d in range(num_decisions):
        lo = idx_lo[:, d]
        w = w_hi[:, d][:, None]
        c_act_d = v_act_next[lo] * (1 - w) + v_act_next[lo + 1] * w
        imm = a[:, d][:, None] * spot[None, :] + b[:, d][:, None]
        val_reg = imm + pred[:, d, :]
        val_act = imm + c_act_d
        if d == 0:
            best_reg, best_act = val_reg, val_act
        else:
            better = val_reg > best_reg
            best_reg = jnp.where(better, val_reg, best_reg)
            best_act = jnp.where(better, val_act, best_act)
    return best_act


def _bf16_exact(x):
    """Round to bf16-representable f32 values, so the kernel's split-precision
    interpolation matmul (bf16 hi + zero residual) is exact in the tests."""
    return jnp.asarray(x, jnp.float32).astype(jnp.bfloat16).astype(jnp.float32)


@pytest.fixture
def case():
    rng = np.random.default_rng(7)
    g, s, b_dim, d = 16, 256, 5, 3
    v_act_next = _bf16_exact(rng.normal(100.0, 30.0, (g, s)))
    dm_std = jnp.asarray(rng.normal(0.0, 1.0, (s, b_dim)), jnp.float32)
    spot = jnp.asarray(rng.uniform(10.0, 50.0, s), jnp.float32)
    grid_next = jnp.linspace(0.0, 1000.0, g)
    targets = jnp.asarray(rng.uniform(-50.0, 1050.0, (g, d)), jnp.float32)
    idx_lo, w_hi = interp_weights(grid_next.astype(jnp.float32), targets)
    # The production path snaps weights to the 1/256 grid (w and 1-w exactly
    # bf16); use the same quadrature here so reference and kernel agree.
    w_hi = decision_kernel.snap_weights(w_hi)
    coeffs = jnp.asarray(rng.normal(0.0, 5.0, (b_dim, g)), jnp.float32)
    ci = coeffs[:, idx_lo] * (1 - w_hi) + coeffs[:, idx_lo + 1] * w_hi  # [B, G, D]
    a = jnp.asarray(rng.normal(0.0, 2.0, (g, d)), jnp.float32)
    b = jnp.asarray(rng.normal(0.0, 20.0, (g, d)), jnp.float32)
    return v_act_next, dm_std, spot, grid_next, idx_lo, w_hi, ci, a, b


def test_interp_weight_matrix_matches_lerp(case):
    v_act_next, _, _, grid_next, idx_lo, w_hi, _, _, _ = case
    g = grid_next.shape[0]
    w_mat = decision_kernel.interp_weight_matrix(idx_lo, w_hi, g, jnp.float32)
    direct = (
        v_act_next[idx_lo] * (1 - w_hi[..., None])
        + v_act_next[idx_lo + 1] * w_hi[..., None]
    )  # [G, D, S]
    via_matmul = jnp.einsum(
        "dgh,hs->gds", w_mat.astype(jnp.float32), v_act_next
    )
    # 1 - w is re-rounded to bf16 in the matrix, so allow one bf16 ulp of the
    # node-value gap on top of f32 noise.
    np.testing.assert_allclose(
        np.asarray(via_matmul), np.asarray(direct), rtol=1e-5, atol=0.5
    )


def test_kernel_matches_xla_path(case):
    v_act_next, dm_std, spot, grid_next, idx_lo, w_hi, ci, a, b = case
    g = grid_next.shape[0]
    expected = _reference_update(
        v_act_next, dm_std, spot, grid_next, idx_lo, w_hi, ci, a, b
    )
    w_mat = decision_kernel.interp_weight_matrix(idx_lo, w_hi, g, jnp.float32)
    tile = decision_kernel.pick_sim_tile(spot.shape[0])
    assert tile > 0
    got = decision_kernel.decision_update_pallas(
        v_act_next, dm_std.T, spot, w_mat, jnp.transpose(ci, (2, 1, 0)),
        a.T, b.T, sim_tile=tile, interpret=True,
    )
    # bf16 re-rounding of (1 - w) can flip the argmax on near-exact ties;
    # both sides of such a tie have almost equal value, so compare values
    # with a tolerance rather than decision identity.
    np.testing.assert_allclose(np.asarray(got), np.asarray(expected), rtol=2e-4, atol=1.0)


def test_pick_sim_tile():
    assert decision_kernel.pick_sim_tile(262144) == 2048
    assert decision_kernel.pick_sim_tile(512) == 512
    assert decision_kernel.pick_sim_tile(384) == 128
    assert decision_kernel.pick_sim_tile(100) == 0


def test_standardise_moments_matches_two_pass():
    """Moment-space standardisation (fused kernel path) must reproduce the
    two-pass column_stats + fit_continuation solve: same mean/std, same
    predictions — including the constant column's special handling (row 0 of
    the standardised Gram matrix must vanish so the Cholesky stays sane)."""
    from storage_tpu.ops import regression as regr

    rng = np.random.default_rng(5)
    s, b_dim, g = 4096, 5, 8
    spot = 30.0 + 1.5 * rng.normal(size=s)
    x0 = 0.3 * rng.normal(size=s)
    x = np.stack([np.ones(s), spot, spot**2, x0, x0 * spot], axis=1)
    y = rng.normal(100.0, 30.0, size=(s, g)) + 4.0 * spot[:, None]

    xj = jnp.asarray(x)
    yj = jnp.asarray(y)
    mean2, std2 = regr.column_stats(xj)
    coeffs2 = regr.fit_continuation((xj - mean2) / std2, yj)

    # The fused path centres/scales with APPROXIMATE stats before
    # accumulating moments; perturb to emulate the adjacent-step centre.
    c = np.asarray(mean2) * (1 + 0.05 * rng.normal(size=b_dim))
    sc = np.asarray(std2) * (1 + 0.05 * rng.normal(size=b_dim))
    c[0], sc[0] = 0.0, 1.0
    u = (xj - c) / sc
    hi = jax.lax.Precision.HIGHEST
    xtx_u = jnp.dot(u.T, u, precision=hi)
    xty_u = jnp.dot(u.T, yj, precision=hi)
    m, xty_s, mu_u, sig_u = regr.standardise_moments(xtx_u, xty_u)
    mean1 = c + sc * np.asarray(mu_u)
    std1 = sc * np.asarray(sig_u)
    coeffs1 = regr.fit_from_moments(m, xty_s)

    np.testing.assert_allclose(mean1, np.asarray(mean2), rtol=1e-10)
    np.testing.assert_allclose(std1, np.asarray(std2), rtol=1e-10)
    # Row/col 0 of the Gram matrix: constant-vs-centred cross moments vanish.
    np.testing.assert_allclose(np.asarray(m[0, 1:]), 0.0, atol=1e-6 * s)
    assert float(m[0, 0]) == pytest.approx(s)
    pred2 = (xj - mean2) / std2 @ coeffs2
    pred1 = (xj - jnp.asarray(mean1)) / jnp.asarray(std1) @ coeffs1
    np.testing.assert_allclose(
        np.asarray(pred1), np.asarray(pred2), rtol=1e-8, atol=1e-6
    )


def test_fit_continuation_singular_fallback():
    """A singular design matrix (duplicate columns, zero ridge) must fall back
    to the cross-sim mean instead of returning NaN coefficients — the failure
    that silently zeroed the value function at large sim counts."""
    from storage_tpu.ops.regression import fit_continuation

    s, g = 64, 4
    rng = np.random.default_rng(3)
    col = rng.normal(0.0, 1.0, s)
    x = jnp.asarray(np.stack([np.ones(s), col, col], axis=1))  # exactly collinear
    y = jnp.asarray(rng.normal(50.0, 10.0, (s, g)))
    coeffs = fit_continuation(x, y, ridge=0.0)
    assert bool(jnp.all(jnp.isfinite(coeffs)))
    np.testing.assert_allclose(
        np.asarray(coeffs[0]), np.asarray(y.mean(axis=0)), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(coeffs[1:]), 0.0, atol=1e-12)


def test_fullstep_kernel_matches_glue_path():
    """Kernel v5 (in-kernel standardise + Cholesky + coefficient interp,
    decision_update_fullstep_pallas) reproduces one backward step of the
    glue + decision_update_moments_pallas composition.  Tolerances cover the
    in-register solver's different (but equally f32) rounding and the 2-pass
    coefficient interpolation."""
    from storage_tpu.basis import parse_basis_functions
    from storage_tpu.ops.regression import standardise_moments, fit_from_moments

    rng = np.random.default_rng(3)
    g, s, d, f = 12, 256, 3, 2
    monomials = tuple(parse_basis_functions("1 + s + x0 + x1 + x0*x1"))
    b_dim = len(monomials)
    spot = jnp.asarray(rng.uniform(10.0, 50.0, s), jnp.float32)
    factors = jnp.asarray(rng.normal(0.0, 1.0, (f, s)), jnp.float32)
    spot_prev = jnp.asarray(rng.uniform(10.0, 50.0, s), jnp.float32)
    factors_prev = jnp.asarray(rng.normal(0.0, 1.0, (f, s)), jnp.float32)
    v_act = _bf16_exact(rng.normal(100.0, 30.0, (g, s)))
    # Plausible carried raw moments: u-columns of a previous design matrix.
    u_prev = np.c_[np.ones(s), rng.normal(0.0, 1.0, (s, b_dim - 1))]
    xtx = jnp.asarray(u_prev.T @ u_prev, jnp.float32)
    vals = rng.normal(50.0, 10.0, (s, g))
    xty = jnp.asarray(u_prev.T @ vals, jnp.float32)
    cmean = jnp.asarray(np.r_[0.0, rng.normal(0.0, 0.2, b_dim - 1)], jnp.float32)
    cstd = jnp.asarray(np.r_[1.0, rng.uniform(0.5, 2.0, b_dim - 1)], jnp.float32)
    grid_next = jnp.linspace(0.0, 1000.0, g).astype(jnp.float32)
    targets = jnp.asarray(rng.uniform(0.0, 1000.0, (g, d)), jnp.float32)
    idx_lo, w_hi = interp_weights(grid_next, targets)
    w_hi = decision_kernel.snap_weights(w_hi)
    w_mat = decision_kernel.interp_weight_matrix(idx_lo, w_hi, g, jnp.float32)
    a = jnp.asarray(rng.normal(0.0, 2.0, (g, d)), jnp.float32)
    b = jnp.asarray(rng.normal(0.0, 20.0, (g, d)), jnp.float32)

    # Reference composition: XLA glue then the v4 kernel (interpret mode).
    m_std, xty_std, mu_u, sig_u = standardise_moments(xtx, xty)
    mean_ref = cmean + cstd * mu_u
    std_ref = cstd * sig_u
    coeffs_ref = fit_from_moments(m_std, xty_std)
    ci = coeffs_ref[:, idx_lo] * (1 - w_hi) + coeffs_ref[:, idx_lo + 1] * w_hi
    best_ref, xtx_ref, xty_ref = decision_kernel.decision_update_moments_pallas(
        v_act, spot, factors, spot_prev, factors_prev, mean_ref, std_ref,
        w_mat, jnp.transpose(ci, (2, 1, 0)), a.T, b.T, monomials,
        sim_tile=128, interpret=True,
    )

    out = decision_kernel.decision_update_fullstep_pallas(
        v_act, spot, factors, spot_prev, factors_prev, xtx, xty, cmean, cstd,
        w_mat, a.T, b.T, monomials, sim_tile=128, interpret=True,
    )
    best_v5, xtx_v5, xty_v5, mean_v5, std_v5, coeffs_v5 = out

    np.testing.assert_allclose(np.asarray(mean_v5), np.asarray(mean_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(std_v5), np.asarray(std_ref),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(coeffs_v5), np.asarray(coeffs_ref),
                               rtol=2e-4, atol=2e-3)
    # Decision values: ties can flip between solver roundings, so compare
    # the realised values, not element equality.
    np.testing.assert_allclose(np.asarray(best_v5), np.asarray(best_ref),
                               rtol=2e-4, atol=1.0)
    np.testing.assert_allclose(np.asarray(xtx_v5), np.asarray(xtx_ref),
                               rtol=2e-4, atol=2e-2)
    np.testing.assert_allclose(np.asarray(xty_v5), np.asarray(xty_ref),
                               rtol=2e-3, atol=2.0)
