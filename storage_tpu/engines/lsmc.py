"""Least-Squares Monte Carlo storage valuation engine.

TPU-native re-design of ``LsmcStorageValuation.Calculate``
(reference ``LsmcValuation/LsmcStorageValuation.cs:57-657``):

* backward induction is a single ``lax.scan`` over time; per step the design
  matrix of basis monomials is built on device, continuation values for all
  inventory-grid points are regressed at once via standardised normal
  equations + Cholesky ([B,S]x[S,G] MXU matmuls replace the reference's
  per-step MKL QR), and the bang-bang decision argmax runs vmapped over
  (grid x decisions x sims) with the reference's anti-foresight trick: argmax
  on REGRESSED values, realising the ACTUAL simulated continuation
  (LsmcStorageValuation.cs:310-336);
* the dual-simulation lower-bound estimator: regression sims drive the
  backward pass, an independent valuation-sim set drives the forward pass
  re-using the saved regression coefficients (LsmcStorageValuation.cs:352-415);
* the forward pass is a second scan carrying per-path inventory, producing
  NPV, standard error, pathwise deltas (:513-518), expected profiles and
  trigger prices (:523-592);
* all cross-path communication is a handful of tiny psums (design-matrix
  moments [B,B]/[B,G] per step + final mean reductions), so paths shard
  across a device mesh with `shard_map` (see ``parallel/mesh.py``).

Special-casing the valuation period is unnecessary here: when the valuation
date is the first active period, the simulated spot for that period is exactly
the forward price (OU step of zero time) and all factor columns are constant,
so the standardised ridge regression automatically degenerates to the
cross-sim mean — the behaviour the reference implements by hand at
LsmcStorageValuation.cs:174-185.

Known deviations from the reference, by design:
* Results are statistically, not bit-wise, comparable (threefry RNG vs
  Mersenne-Twister; linspace grids vs global-spacing grids) — acceptance is
  "NPV within 2 MC standard errors" per BASELINE.md.
* The reference adds a *cumulative running sum* of terminal values into
  ``pvBySim`` (LsmcStorageValuation.cs:601-609), which mis-states per-sim PV
  whenever the storage may be non-empty at end (invisible in its tests, which
  all use must-be-empty storage). This engine adds each sim's own terminal
  value.
* The forward-pass terminal PV uses the valuation sims' end-period spot, not
  the regression sims' (LsmcStorageValuation.cs:598 uses regression sims even
  though the forward pass runs on valuation sims).
"""
from __future__ import annotations

import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .. import grid as gridmod
from ..basis import Monomial, design_matrix
from ..facility import CompiledStorage
from ..ops import interp
from ..ops import decision_kernel
from ..ops import forward_kernel
from ..ops.regression import (
    column_stats,
    fit_continuation,
    fit_from_moments,
    predict,
    standardise_moments,
)
from .intrinsic import immediate_pv

NUM_TRIGGER_PRICE_VOLUMES = 10  # LsmcStorageValuation.cs:383


def resolve_use_pallas(use_pallas: tp.Optional[bool], num_sims: int, dtype) -> bool:
    """Auto-enable the fused Pallas decision kernel on TPU backends for f32
    workloads whose local sim count tiles cleanly; anything else (CPU tests,
    f64 validation runs, ragged path counts) keeps the pure-XLA path."""
    if use_pallas is not None:
        return bool(use_pallas)
    return (
        jax.default_backend() == "tpu"
        and jnp.dtype(dtype) == jnp.float32
        and decision_kernel.pick_sim_tile(num_sims) > 0
    )


class LsmcEngineResult(tp.NamedTuple):
    npv: jnp.ndarray
    standard_error: jnp.ndarray
    backward_npv: jnp.ndarray
    deltas: jnp.ndarray  # [N+1] (last entry 0, as in the reference series)
    # Expected profile arrays, all [N+1]:
    profile_inventory: jnp.ndarray  # mean inventory at period start (end: final)
    profile_inject_withdraw: jnp.ndarray
    profile_cmdty_consumed: jnp.ndarray
    profile_inventory_loss: jnp.ndarray
    profile_pv: jnp.ndarray
    # Trigger prices, [N, 10] / [N] (NaN where absent):
    trigger_inject_volumes: jnp.ndarray
    trigger_inject_prices: jnp.ndarray
    trigger_withdraw_volumes: jnp.ndarray
    trigger_withdraw_prices: jnp.ndarray
    max_inject_volume: jnp.ndarray
    max_inject_trigger_price: jnp.ndarray
    max_withdraw_volume: jnp.ndarray
    max_withdraw_trigger_price: jnp.ndarray
    # Optional per-sim panels (None unless requested):
    sim_inventory: tp.Optional[jnp.ndarray]  # [N+1, S]
    sim_inject_withdraw: tp.Optional[jnp.ndarray]  # [N, S]
    sim_cmdty_consumed: tp.Optional[jnp.ndarray]  # [N, S]
    sim_inventory_loss: tp.Optional[jnp.ndarray]  # [N, S]
    sim_net_volume: tp.Optional[jnp.ndarray]  # [N, S]
    sim_pv: tp.Optional[jnp.ndarray]  # [N+1, S]


def _pmean(x, axis_name):
    if axis_name is None:
        return x
    return jax.lax.pmean(x, axis_name)


def _psum(x, axis_name):
    if axis_name is None:
        return x
    return jax.lax.psum(x, axis_name)


def _global_mean_over_sims(x, axis_name):
    """Mean over the sims axis (last), reduced across path shards."""
    local_sum = jnp.sum(x, axis=-1)
    local_n = x.shape[-1]
    total = _psum(local_sum, axis_name)
    count = _psum(jnp.asarray(local_n, x.dtype), axis_name)
    return total / count


def _step_slice(arrays: tp.Dict[str, jnp.ndarray], sl) -> tp.Dict[str, jnp.ndarray]:
    return {k: v[sl] for k, v in arrays.items()}


def _decision_cashflow_coeffs(decisions, x):
    """Per-decision immediate-PV decomposition: pv = a * spot + b (spot-independent
    parts in b).  Shapes follow ``decisions``."""
    is_inject = decisions > 0.0
    abs_d = jnp.abs(decisions)
    consumed = jnp.where(is_inject, x["inj_pcnt"], x["wdr_pcnt"]) * abs_d
    cost_npv = jnp.where(is_inject, x["inj_cost"], x["wdr_cost"]) * abs_d * x["df_flow"]
    a = -(decisions + consumed) * x["df_settle"]
    return a, -cost_npv, consumed


def lsmc_backward(
    arrays: tp.Dict[str, jnp.ndarray],
    spot_reg: jnp.ndarray,  # [N+1, S]
    factors_reg: jnp.ndarray,  # [N+1, F, S]
    monomials: tp.Tuple[Monomial, ...],
    num_extra_decisions: int,
    terminal_fn,
    ratchet_is_step: bool,
    axis_name: tp.Optional[str],
    use_pallas: bool = False,
    snap_interp: tp.Optional[bool] = None,
):
    """Backward induction.  Returns (v0 [G, S] values at the first period,
    regression payload dict of stacked per-step arrays [N, ...]).

    ``snap_interp`` rounds interpolation weights to the 1/256 grid (the
    quadrature the Pallas kernel requires for exact 2-pass bf16 interpolation);
    defaults to ``use_pallas`` so the XLA path can be run on the identical
    quadrature for equivalence testing."""
    if snap_interp is None:
        snap_interp = use_pallas
    grids = arrays["grids"]
    n = grids.shape[0] - 1

    # Terminal storage values per (grid point, sim) — LsmcStorageValuation.cs:110-131.
    if terminal_fn is None:
        v_end = jnp.zeros((grids.shape[1], spot_reg.shape[1]), grids.dtype)
    else:
        # Broadcast: user terminal functions may return scalars or ignore args.
        v_end = jnp.broadcast_to(
            jnp.asarray(terminal_fn(spot_reg[n][None, :], grids[n][:, None]), grids.dtype),
            (grids.shape[1], spot_reg.shape[1]),
        )

    per_step = {
        "grid": grids[:n],
        "grid_next": grids[1:],
        "next_min": arrays["lower"][1:],
        "next_max": arrays["upper"][1:],
        "df_settle": arrays["df_settle"],
        "df_flow": arrays["df_flow"],
        "inj_cost": arrays["inj_cost"],
        "wdr_cost": arrays["wdr_cost"],
        "inj_pcnt": arrays["inj_pcnt"],
        "wdr_pcnt": arrays["wdr_pcnt"],
        "loss_pcnt": arrays["loss_pcnt"],
        "inv_cost_rate": arrays["inv_cost_rate"],
        "ratchet_inv": arrays["ratchet_inv"],
        "ratchet_min": arrays["ratchet_min"],
        "ratchet_max": arrays["ratchet_max"],
        "spot": spot_reg[:n],
        "factors": factors_reg[:n],
    }

    num_decisions = 2 * num_extra_decisions + 3
    # The fully fused path additionally accumulates the next step's raw
    # regression moments inside the decision kernel (one pass over the value
    # panel instead of two); it needs at least one simulated factor panel to
    # build the design matrix on-tile.
    use_fused_moments = use_pallas and factors_reg.shape[1] > 0

    def step_prep(x, coeffs):
        """Decision set, snapped interpolation, coefficient interpolation and
        immediate-PV decomposition for one backward step."""
        grid_t = x["grid"]
        min_rate, max_rate = gridmod.ratchet_rates(
            x["ratchet_inv"], x["ratchet_min"], x["ratchet_max"], ratchet_is_step, grid_t
        )
        decisions = gridmod.bang_bang_decisions(
            min_rate, max_rate, grid_t, x["loss_pcnt"], x["next_min"], x["next_max"],
            num_extra_decisions,
        )  # [G, D]
        loss = x["loss_pcnt"] * grid_t  # [G]
        inv_after = grid_t[:, None] + decisions - loss[:, None]  # [G, D]
        idx_lo, w_hi = interp.interp_weights(x["grid_next"], inv_after)  # [G, D]
        if snap_interp:
            # Snapped weights make the hat matrix exactly bf16-representable
            # (2-pass exact interpolation in the kernel); use the same snapped
            # quadrature for the coefficient interpolation so regressed and
            # actual continuations target identical inventories.
            w_hi = decision_kernel.snap_weights(w_hi)

        # Regressed continuation at every (grid, decision) target inventory:
        # interpolate in coefficient space (linear interp commutes with the
        # linear model) — replaces a per-decision gather+lerp over [G, S]
        # fitted values.
        ci = (
            coeffs[:, idx_lo] * (1 - w_hi) + coeffs[:, idx_lo + 1] * w_hi
        )  # [B, G, D]

        a, b, _consumed = _decision_cashflow_coeffs(decisions, x)  # [G, D]
        inv_cost_npv = x["inv_cost_rate"] * grid_t * x["df_flow"]  # [G]
        b = b - inv_cost_npv[:, None]
        return idx_lo, w_hi, ci, a, b

    def backward_step_fused(carry, x):
        # Moments of this step's design matrix (centred/scaled by the NEXT
        # step's stats, u-coordinates) against the next period's values arrive
        # in the carry, accumulated inside the previous kernel call; recover
        # the exactly-standardised system and compose the affine transform.
        v_act_next, xtx_u, xty_u, c, s = carry
        xtx_g = _psum(xtx_u, axis_name)
        xty_g = _psum(xty_u, axis_name)
        m_std, xty_std, mu_u, sig_u = standardise_moments(xtx_g, xty_g)
        mean = c + s * mu_u
        std = s * sig_u
        coeffs = fit_from_moments(m_std, xty_std)  # [B, G]

        idx_lo, w_hi, ci, a, b = step_prep(x, coeffs)
        g_next = x["grid_next"].shape[0]
        w_mat = decision_kernel.interp_weight_matrix(
            idx_lo, w_hi, g_next, coeffs.dtype
        )
        spot = x["spot"]
        prev = jnp.maximum(x["idx"] - 1, 0)
        spot_prev = jax.lax.dynamic_index_in_dim(spot_reg, prev, keepdims=False)
        fac_prev = jax.lax.dynamic_index_in_dim(factors_reg, prev, keepdims=False)
        best_act, xtx_next, xty_next = decision_kernel.decision_update_moments_pallas(
            v_act_next, spot, x["factors"], spot_prev, fac_prev, mean, std,
            w_mat, jnp.transpose(ci, (2, 1, 0)), a.T, b.T,
            monomials, sim_tile=decision_kernel.pick_sim_tile(spot.shape[0]),
        )
        return (best_act, xtx_next, xty_next, mean, std), {
            "mean": mean, "std": std, "coeffs": coeffs,
        }

    if use_fused_moments:
        # Bootstrap: moments of the LAST step's design matrix against the
        # terminal values, standardised with exact two-pass stats (every
        # later step's moments come out of the kernel in u-coordinates).
        dm_last = design_matrix(monomials, spot_reg[n - 1], factors_reg[n - 1])
        mean0, std0 = column_stats(dm_last, axis_name)
        u0 = (dm_last - mean0) / std0
        hi = jax.lax.Precision.HIGHEST
        xtx0 = jnp.dot(u0.T, u0, preferred_element_type=grids.dtype,
                       precision=hi)
        xty0 = jnp.dot(u0.T, v_end.T, preferred_element_type=grids.dtype,
                       precision=hi)
        per_step_fm = dict(per_step)
        per_step_fm["idx"] = jnp.arange(n)
        (v0, _, _, _, _), regression = jax.lax.scan(
            backward_step_fused, (v_end, xtx0, xty0, mean0, std0), per_step_fm,
            reverse=True,
        )
        return v0, regression

    def backward_step(v_act_next, x):
        # Regression of next-period value on this period's state
        # (LsmcStorageValuation.cs:191-212, via normal equations).
        dm = design_matrix(monomials, x["spot"], x["factors"])  # [S, B]
        mean, std = column_stats(dm, axis_name)
        dm_std = (dm - mean) / std
        coeffs = fit_continuation(dm_std, v_act_next.T, axis_name)  # [B, G]

        idx_lo, w_hi, ci, a, b = step_prep(x, coeffs)

        spot = x["spot"]  # [S]
        if use_pallas:
            # Fused VMEM-resident decision update: no [G, D, S] HBM temporaries.
            g_next = x["grid_next"].shape[0]
            w_mat = decision_kernel.interp_weight_matrix(
                idx_lo, w_hi, g_next, coeffs.dtype
            )  # [D, G, G_next]
            best_act = decision_kernel.decision_update_pallas(
                v_act_next, dm_std.T, spot,
                w_mat, jnp.transpose(ci, (2, 1, 0)), a.T, b.T,
                sim_tile=decision_kernel.pick_sim_tile(spot.shape[0]),
            )
            return best_act, {"mean": mean, "std": std, "coeffs": coeffs}

        pred = jnp.einsum(
            "sb,bgd->gds", dm_std, ci, precision=jax.lax.Precision.HIGH
        )  # [G, D, S]
        best_reg = None
        best_act = None
        # Unrolled loop over the (small, static) decision axis: running argmax on
        # regressed values, realising actual values (the anti-foresight trick,
        # LsmcStorageValuation.cs:327-335) without materialising [G, D, S] twice.
        # Initialising from decision 0 (not -inf) keeps ties/non-finite
        # comparisons on the first decision, matching the Pallas kernel.
        for d in range(num_decisions):
            lo = idx_lo[:, d]
            w = w_hi[:, d][:, None]
            c_act_d = v_act_next[lo] * (1 - w) + v_act_next[lo + 1] * w  # [G, S]
            imm = a[:, d][:, None] * spot[None, :] + b[:, d][:, None]
            val_reg = imm + pred[:, d, :]
            val_act = imm + c_act_d
            if d == 0:
                best_reg, best_act = val_reg, val_act
            else:
                better = val_reg > best_reg
                best_reg = jnp.where(better, val_reg, best_reg)
                best_act = jnp.where(better, val_act, best_act)
        return best_act, {"mean": mean, "std": std, "coeffs": coeffs}

    v0, regression = jax.lax.scan(backward_step, v_end, per_step, reverse=True)
    return v0, regression


def _trigger_outputs(x, xbar, expected_inventory, ratchet_is_step: bool,
                     num_extra_decisions: int, dtype):
    """Per-step trigger-price outputs at the expected inventory
    (LsmcStorageValuation.cs:523-592).  ``x`` carries the step scalars,
    ``xbar`` the cross-sim mean standardised design row."""
    num_tv = NUM_TRIGGER_PRICE_VOLUMES
    cbar = xbar @ x["coeffs"]  # [G_next]
    e_loss = x["loss_pcnt"] * expected_inventory
    e_min_rate, e_max_rate = gridmod.ratchet_rates(
        x["ratchet_inv"], x["ratchet_min"], x["ratchet_max"], ratchet_is_step,
        expected_inventory,
    )
    e_decisions = gridmod.bang_bang_decisions(
        e_min_rate, e_max_rate, expected_inventory, x["loss_pcnt"], x["next_min"],
        x["next_max"], num_extra_decisions,
    )  # [D]

    def side(selector_max: bool):
        if selector_max:  # inject side
            extreme = jnp.max(e_decisions)
            nonneg = jnp.where(e_decisions >= 0, e_decisions, jnp.inf)
            alternative = jnp.min(nonneg)
            active = (extreme > 0) & (extreme > alternative)
        else:  # withdraw side
            extreme = jnp.min(e_decisions)
            nonpos = jnp.where(e_decisions <= 0, e_decisions, -jnp.inf)
            alternative = jnp.max(nonpos)
            active = (extreme < 0) & (extreme < alternative)

        def pv_parts(volume):
            is_inject = volume > 0.0
            abs_v = jnp.abs(volume)
            consumed_v = jnp.where(is_inject, x["inj_pcnt"], x["wdr_pcnt"]) * abs_v
            cost_v = (
                jnp.where(is_inject, x["inj_cost"], x["wdr_cost"]) * abs_v * x["df_flow"]
            )
            cont_v = interp.interp_vector(
                x["grid_next"], cbar, expected_inventory + volume - e_loss
            )
            return cont_v, cost_v, consumed_v

        alt_cont, alt_cost, alt_consumed = pv_parts(alternative)
        j = jnp.arange(1, num_tv + 1, dtype=dtype)
        volumes = alternative + j * (extreme - alternative) / num_tv  # ends at extreme
        cont_v, cost_v, consumed_v = pv_parts(volumes)
        # Price making the trigger volume indifferent to the alternative
        # (CalcTriggerPrice, LsmcStorageValuation.cs:704-723).
        denom = x["df_settle"] * (volumes - alternative + consumed_v - alt_consumed)
        prices = ((cont_v - alt_cont) - (cost_v - alt_cost)) / denom
        nan = jnp.asarray(jnp.nan, dtype)
        volumes = jnp.where(active, volumes, nan)
        prices = jnp.where(active, prices, nan)
        return volumes, prices, jnp.where(active, extreme, nan), jnp.where(
            active, prices[-1], nan
        )

    inj_volumes, inj_prices, max_inj_vol, max_inj_price = side(True)
    wdr_volumes, wdr_prices, max_wdr_vol, max_wdr_price = side(False)
    return {
        "inj_volumes": inj_volumes,
        "inj_prices": inj_prices,
        "wdr_volumes": wdr_volumes,
        "wdr_prices": wdr_prices,
        "max_inj_vol": max_inj_vol,
        "max_inj_price": max_inj_price,
        "max_wdr_vol": max_wdr_vol,
        "max_wdr_price": max_wdr_price,
    }


def lsmc_forward(
    arrays: tp.Dict[str, jnp.ndarray],
    spot_val: jnp.ndarray,  # [N+1, S]
    factors_val: jnp.ndarray,  # [N+1, F, S]
    regression: tp.Dict[str, jnp.ndarray],  # stacked [N, ...] from the backward pass
    starting_inventory,
    monomials: tp.Tuple[Monomial, ...],
    num_extra_decisions: int,
    discount_deltas: bool,
    terminal_fn,
    ratchet_is_step: bool,
    axis_name: tp.Optional[str],
    return_sim_data: bool,
    use_pallas: bool = False,
):
    grids = arrays["grids"]
    n = grids.shape[0] - 1
    dtype = grids.dtype
    s_local = spot_val.shape[1]
    sim_tile = decision_kernel.pick_sim_tile(s_local)
    fused = (
        use_pallas and not return_sim_data and dtype == jnp.float32
        and sim_tile > 0
    )

    per_step = {
        "grid_next": grids[1:],
        "next_min": arrays["lower"][1:],
        "next_max": arrays["upper"][1:],
        "fwd": arrays["fwd"][:n],
        "df_settle": arrays["df_settle"],
        "df_flow": arrays["df_flow"],
        "inj_cost": arrays["inj_cost"],
        "wdr_cost": arrays["wdr_cost"],
        "inj_pcnt": arrays["inj_pcnt"],
        "wdr_pcnt": arrays["wdr_pcnt"],
        "loss_pcnt": arrays["loss_pcnt"],
        "inv_cost_rate": arrays["inv_cost_rate"],
        "ratchet_inv": arrays["ratchet_inv"],
        "ratchet_min": arrays["ratchet_min"],
        "ratchet_max": arrays["ratchet_max"],
        "spot": spot_val[:n],
        "factors": factors_val[:n],
        "mean": regression["mean"],
        "std": regression["std"],
        "coeffs": regression["coeffs"],
    }

    num_decisions = 2 * num_extra_decisions + 3
    num_tv = NUM_TRIGGER_PRICE_VOLUMES

    if fused:
        # Pack per-step scalars for the fused kernel's SMEM parameter vector.
        g_next = grids.shape[1]
        lo_all = per_step["grid_next"][:, 0]
        hi_all = per_step["grid_next"][:, g_next - 1]
        span = hi_all - lo_all
        delta_pos = span / (g_next - 1) > 0
        inv_delta = jnp.where(
            delta_pos, (g_next - 1) / jnp.where(span > 0, span, 1.0), 0.0
        )
        per_step["params"] = jnp.stack(
            [
                per_step["df_settle"], per_step["df_flow"],
                per_step["inj_cost"], per_step["wdr_cost"],
                per_step["inj_pcnt"], per_step["wdr_pcnt"],
                per_step["loss_pcnt"], per_step["inv_cost_rate"],
                per_step["next_min"], per_step["next_max"],
                lo_all, hi_all, inv_delta,
            ],
            axis=1,
        ).astype(jnp.float32)

    def forward_step_fused(carry, x):
        inventory, pv = carry  # [S], [S]
        new_inv, new_pv, _opt_dec, _opt_cons, sums, xbar_sum = (
            forward_kernel.forward_step_pallas(
                x["params"], x["mean"], x["std"],
                x["ratchet_inv"], x["ratchet_min"], x["ratchet_max"],
                x["spot"], x["factors"], inventory, pv, x["coeffs"],
                monomials, num_extra_decisions, ratchet_is_step, sim_tile,
            )
        )
        count = _psum(jnp.asarray(s_local, dtype), axis_name)
        sums_g = _psum(sums, axis_name)
        xbar = _psum(xbar_sum, axis_name) / count
        expected_inventory = sums_g[forward_kernel._A_INV] / count
        profile = (
            expected_inventory,
            sums_g[forward_kernel._A_DEC] / count,
            sums_g[forward_kernel._A_CONS] / count,
            sums_g[forward_kernel._A_LOSS] / count,
            sums_g[forward_kernel._A_IMM] / count,
        )
        disc = x["df_settle"] if discount_deltas else jnp.ones_like(x["df_settle"])
        delta = sums_g[forward_kernel._A_DELTA] / count / x["fwd"] * disc
        outputs = {
            "delta": delta,
            "profile": profile,
            **_trigger_outputs(
                x, xbar, expected_inventory, ratchet_is_step,
                num_extra_decisions, dtype,
            ),
        }
        return (new_inv, new_pv), outputs

    def forward_step(carry, x):
        inventory, pv = carry  # [S], [S]

        dm = design_matrix(monomials, x["spot"], x["factors"])  # [S, B]
        dm_std = (dm - x["mean"]) / x["std"]
        c_reg = predict(dm_std, x["coeffs"])  # [S, G_next]

        min_rate, max_rate = gridmod.ratchet_rates(
            x["ratchet_inv"], x["ratchet_min"], x["ratchet_max"], ratchet_is_step, inventory
        )
        decisions = gridmod.bang_bang_decisions(
            min_rate, max_rate, inventory, x["loss_pcnt"], x["next_min"], x["next_max"],
            num_extra_decisions,
        )  # [S, D]
        loss = x["loss_pcnt"] * inventory  # [S]
        inv_after = inventory[:, None] + decisions - loss[:, None]  # [S, D]
        cont = interp.interp_per_sim(x["grid_next"], c_reg, inv_after)  # [S, D]

        a, b, consumed = _decision_cashflow_coeffs(decisions, x)  # [S, D]
        inv_cost_npv = x["inv_cost_rate"] * inventory * x["df_flow"]  # [S]
        imm = a * x["spot"][:, None] + b - inv_cost_npv[:, None]  # [S, D]

        total = imm + cont
        best = jnp.argmax(total, axis=1)  # [S]
        # One-hot contraction instead of take_along_axis: D is tiny and
        # minor-axis gathers are slow on TPU.
        onehot = (best[:, None] == jnp.arange(num_decisions)).astype(imm.dtype)
        take = lambda arr: jnp.sum(arr * onehot, axis=1)
        opt_decision = take(decisions)
        opt_consumed = take(consumed)
        opt_imm = take(imm)
        new_inventory = take(inv_after)
        new_pv = pv + opt_imm

        # Pathwise delta (LsmcStorageValuation.cs:513-518): assumes
        # spot = forward x stochastic factor.
        disc = x["df_settle"] if discount_deltas else jnp.ones_like(x["df_settle"])
        delta = (
            _global_mean_over_sims(-(opt_decision + opt_consumed) * x["spot"], axis_name)
            / x["fwd"]
            * disc
        )

        expected_inventory = _global_mean_over_sims(inventory, axis_name)
        profile = (
            expected_inventory,
            _global_mean_over_sims(opt_decision, axis_name),
            _global_mean_over_sims(opt_consumed, axis_name),
            _global_mean_over_sims(loss, axis_name),
            _global_mean_over_sims(opt_imm, axis_name),
        )

        # ---- Trigger prices at the expected inventory (LsmcStorageValuation.cs:523-592).
        # Mean continuation per grid point = (mean standardised design row) @
        # coeffs — no [S, G] reduction needed.
        xbar = _global_mean_over_sims(dm_std.T, axis_name)  # [B]
        outputs = {
            "delta": delta,
            "profile": profile,
            **_trigger_outputs(
                x, xbar, expected_inventory, ratchet_is_step,
                num_extra_decisions, dtype,
            ),
        }
        if return_sim_data:
            outputs["sim"] = {
                "inventory": inventory,
                "inject_withdraw": opt_decision,
                "cmdty_consumed": opt_consumed,
                "inventory_loss": loss,
                "pv": opt_imm,
            }
        return (new_inventory, new_pv), outputs

    inv0 = jnp.full((s_local,), jnp.asarray(starting_inventory, dtype))
    pv0 = jnp.zeros((s_local,), dtype)
    (final_inventory, pv_by_sim), outputs = jax.lax.scan(
        forward_step_fused if fused else forward_step, (inv0, pv0), per_step
    )

    # Terminal period PV for non-empty storage (corrected semantics; see module
    # docstring re LsmcStorageValuation.cs:594-612).
    if terminal_fn is not None:
        terminal_pv = jnp.broadcast_to(
            jnp.asarray(terminal_fn(spot_val[n], final_inventory), dtype),
            final_inventory.shape,
        )
        pv_by_sim = pv_by_sim + terminal_pv
        end_pv = _global_mean_over_sims(terminal_pv, axis_name)
    else:
        terminal_pv = jnp.zeros_like(pv_by_sim)
        end_pv = jnp.zeros((), dtype)

    npv = _global_mean_over_sims(pv_by_sim, axis_name)
    # Sample standard error across all shards (ddof=1, StorageHelper uses the
    # sample standard deviation — LsmcStorageValuation.cs:618).
    count = _psum(jnp.asarray(s_local, dtype), axis_name)
    sq_sum = _psum(jnp.sum((pv_by_sim - npv) ** 2), axis_name)
    standard_error = jnp.sqrt(sq_sum / (count - 1.0)) / jnp.sqrt(count)

    expected_final_inventory = _global_mean_over_sims(final_inventory, axis_name)
    prof_inv, prof_dec, prof_cons, prof_loss, prof_pv = outputs["profile"]
    zero = jnp.zeros((1,), dtype)
    profile_inventory = jnp.concatenate([prof_inv, expected_final_inventory[None]])
    profile_dec = jnp.concatenate([prof_dec, zero])
    profile_cons = jnp.concatenate([prof_cons, zero])
    profile_loss = jnp.concatenate([prof_loss, zero])
    profile_pv = jnp.concatenate([prof_pv, end_pv[None]])
    deltas = jnp.concatenate([outputs["delta"], zero])

    sim_panels = {}
    if return_sim_data:
        sim = outputs["sim"]
        sim_panels = {
            "sim_inventory": jnp.concatenate([sim["inventory"], final_inventory[None]], axis=0),
            "sim_inject_withdraw": sim["inject_withdraw"],
            "sim_cmdty_consumed": sim["cmdty_consumed"],
            "sim_inventory_loss": sim["inventory_loss"],
            "sim_net_volume": -sim["inject_withdraw"] - sim["cmdty_consumed"],
            "sim_pv": jnp.concatenate([sim["pv"], terminal_pv[None]], axis=0),
        }

    return {
        "npv": npv,
        "standard_error": standard_error,
        "deltas": deltas,
        "profile_inventory": profile_inventory,
        "profile_inject_withdraw": profile_dec,
        "profile_cmdty_consumed": profile_cons,
        "profile_inventory_loss": profile_loss,
        "profile_pv": profile_pv,
        "trigger_inject_volumes": outputs["inj_volumes"],
        "trigger_inject_prices": outputs["inj_prices"],
        "trigger_withdraw_volumes": outputs["wdr_volumes"],
        "trigger_withdraw_prices": outputs["wdr_prices"],
        "max_inject_volume": outputs["max_inj_vol"],
        "max_inject_trigger_price": outputs["max_inj_price"],
        "max_withdraw_volume": outputs["max_wdr_vol"],
        "max_withdraw_trigger_price": outputs["max_wdr_price"],
        **sim_panels,
    }


@partial(
    jax.jit,
    static_argnames=(
        "monomials",
        "num_extra_decisions",
        "discount_deltas",
        "terminal_fn",
        "ratchet_is_step",
        "axis_name",
        "return_sim_data",
        "use_pallas",
        "return_regression",
        "snap_interp",
    ),
)
def lsmc_core(
    arrays: tp.Dict[str, jnp.ndarray],
    spot_reg: jnp.ndarray,
    factors_reg: jnp.ndarray,
    spot_val: jnp.ndarray,
    factors_val: jnp.ndarray,
    starting_inventory,
    monomials: tp.Tuple[Monomial, ...],
    num_extra_decisions: int,
    discount_deltas: bool,
    terminal_fn,
    ratchet_is_step: bool,
    axis_name: tp.Optional[str] = None,
    return_sim_data: bool = False,
    use_pallas: bool = False,
    return_regression: bool = False,
    snap_interp: tp.Optional[bool] = None,
) -> tp.Dict[str, jnp.ndarray]:
    v0, regression = lsmc_backward(
        arrays, spot_reg, factors_reg, monomials, num_extra_decisions, terminal_fn,
        ratchet_is_step, axis_name, use_pallas=use_pallas, snap_interp=snap_interp,
    )
    result = lsmc_forward(
        arrays, spot_val, factors_val, regression, starting_inventory, monomials,
        num_extra_decisions, discount_deltas, terminal_fn, ratchet_is_step, axis_name,
        return_sim_data, use_pallas=use_pallas,
    )
    # Backward (upper-ish) estimate: mean over sims of the first-period values at
    # the known starting inventory (grid[0] is degenerate) — LsmcStorageValuation.cs:623.
    result["backward_npv"] = _global_mean_over_sims(v0[0], axis_name)
    if return_regression:
        # Per-step regression payload (the backward->forward hand-off the
        # reference keeps in regressCoeffsBuilder, LsmcStorageValuation.cs:159)
        # — identical on every path shard after the moments psum, so it is a
        # replicated output; used to persist RegressionCheckpoints.
        result["regression_mean"] = regression["mean"]
        result["regression_std"] = regression["std"]
        result["regression_coeffs"] = regression["coeffs"]
    return result


@partial(
    jax.jit,
    static_argnames=(
        "monomials", "num_extra_decisions", "discount_deltas", "terminal_fn",
        "ratchet_is_step", "axis_name",
    ),
)
def lsmc_npv_and_ad_deltas(
    arrays: tp.Dict[str, jnp.ndarray],
    stoch_reg: jnp.ndarray,  # [N+1, S] spot / forward (stochastic part)
    factors_reg: jnp.ndarray,
    stoch_val: jnp.ndarray,
    factors_val: jnp.ndarray,
    starting_inventory,
    monomials: tp.Tuple[Monomial, ...],
    num_extra_decisions: int,
    discount_deltas: bool,
    terminal_fn,
    ratchet_is_step: bool,
    axis_name: tp.Optional[str] = None,
):
    """NPV and deltas by automatic differentiation through the whole valuation.

    The pathwise assumption of the reference (spot = forward x stochastic
    factor, LsmcStorageValuation.cs:514-517) is made explicit: the simulated
    spot is reconstructed as ``fwd[t] * stoch[t]`` inside the differentiated
    graph, and d(NPV)/d(fwd) is one reverse-mode sweep.  The bang-bang argmax
    policy is almost-everywhere constant, so AD yields the envelope-theorem
    gradient — under this model it reduces EXACTLY to the reference's
    hand-derived pathwise formula (pinned by tests/test_ad_deltas_api.py);
    its value is generality: the sweep stays exact for price models where
    spot is not forward-proportional and for terminal-value structures the
    hand formula ignores.  Returns (npv, deltas [N+1]) with deltas
    undiscounted unless ``discount_deltas`` (delta scaling mirrors the
    pathwise series: last entry 0).
    """

    def npv_of_fwd(fwd):
        arr = dict(arrays)
        arr["fwd"] = fwd
        spot_reg = fwd[:, None] * stoch_reg
        spot_val = fwd[:, None] * stoch_val
        result = lsmc_core(
            arr, spot_reg, factors_reg, spot_val, factors_val,
            starting_inventory, monomials, num_extra_decisions, False,
            terminal_fn, ratchet_is_step, axis_name=axis_name,
            return_sim_data=False,
        )
        return result["npv"]

    fwd = arrays["fwd"]
    npv, grad_fwd = jax.value_and_grad(npv_of_fwd)(fwd)
    if discount_deltas:
        # value_and_grad discounts to the valuation date already.
        return npv, grad_fwd
    # The reference's DiscountDeltas=False divides the discount back out.
    df = jnp.concatenate([arrays["df_settle"], jnp.ones((1,), fwd.dtype)])
    return npv, grad_fwd / df


def build_engine_arrays(
    compiled: CompiledStorage,
    fwd: np.ndarray,
    df_settle: np.ndarray,
    df_flow: np.ndarray,
    inventory_lower: np.ndarray,
    inventory_upper: np.ndarray,
    num_grid_points: int,
    dtype,
) -> tp.Dict[str, jnp.ndarray]:
    grids = gridmod.inventory_grids(inventory_lower, inventory_upper, num_grid_points)
    return {
        "grids": jnp.asarray(grids, dtype),
        "fwd": jnp.asarray(fwd, dtype),
        "lower": jnp.asarray(inventory_lower, dtype),
        "upper": jnp.asarray(inventory_upper, dtype),
        "df_settle": jnp.asarray(df_settle, dtype),
        "df_flow": jnp.asarray(df_flow, dtype),
        "inj_cost": jnp.asarray(compiled.inj_cost, dtype),
        "wdr_cost": jnp.asarray(compiled.wdr_cost, dtype),
        "inj_pcnt": jnp.asarray(compiled.inj_consumed_pcnt, dtype),
        "wdr_pcnt": jnp.asarray(compiled.wdr_consumed_pcnt, dtype),
        "loss_pcnt": jnp.asarray(compiled.loss_pcnt, dtype),
        "inv_cost_rate": jnp.asarray(compiled.inv_cost_rate, dtype),
        "ratchet_inv": jnp.asarray(compiled.ratchet_inv, dtype),
        "ratchet_min": jnp.asarray(compiled.ratchet_min, dtype),
        "ratchet_max": jnp.asarray(compiled.ratchet_max, dtype),
    }
