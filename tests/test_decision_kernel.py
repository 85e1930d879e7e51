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
