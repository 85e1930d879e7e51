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
from ..basis import Monomial, design_matrix, has_generic
from ..facility import CompiledStorage
from ..ops import interp
from ..ops import decision_kernel
from ..ops import forward_kernel
from ..models import spot_sim as spot_sim_mod
from ..ops.regression import (
    column_stats,
    fit_continuation,
    fit_from_moments,
    predict,
    standardise_moments,
)

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


_FULLSTEP_ENV = "STORAGE_TPU_FULLSTEP"


def resolve_fullstep(use_fused_moments: bool, axis_name) -> bool:
    """Kernel v5 — the ENTIRE backward step (moment standardisation +
    Cholesky solve + coefficient interpolation + decision update + next
    moments) as one pallas_call.  Opt-in via STORAGE_TPU_FULLSTEP=1:
    measured ~2% SLOWER than the v4 kernel + XLA glue on v5e (the glue's
    small ops overlap with the kernel's DMA pipeline, while an in-kernel
    tile-0 prologue runs serially — docs/ROOFLINE.md round-4 "kernel v5").
    Kept as working infrastructure: on hardware where per-op XLA latency is
    worse, or for a future multi-step-fused scan, flipping the env flag
    re-enables it.  Single-device only (sharded runs psum the moments
    between steps, which only the XLA glue can do)."""
    import os

    if os.environ.get(_FULLSTEP_ENV, "0") not in ("1", "true", "True"):
        return False
    return use_fused_moments and axis_name is None


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


def _decision_cashflow_coeffs(decisions, x):
    """Per-decision immediate-PV decomposition: pv = a * spot + b (spot-independent
    parts in b).  Shapes follow ``decisions``."""
    is_inject = decisions > 0.0
    abs_d = jnp.abs(decisions)
    consumed = jnp.where(is_inject, x["inj_pcnt"], x["wdr_pcnt"]) * abs_d
    cost_npv = jnp.where(is_inject, x["inj_cost"], x["wdr_cost"]) * abs_d * x["df_flow"]
    a = -(decisions + consumed) * x["df_settle"]
    return a, -cost_npv, consumed


def _backward_per_step(arrays: tp.Dict[str, jnp.ndarray]) -> tp.Dict[str, jnp.ndarray]:
    """Per-step facility/discount arrays feeding the backward scan ([N, ...])."""
    grids = arrays["grids"]
    n = grids.shape[0] - 1
    return {
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
    }


def _terminal_values(terminal_fn, spot_end, grid_end, num_grid, num_sims, dtype):
    """Terminal storage values per (grid point, sim) — LsmcStorageValuation.cs:110-131."""
    if terminal_fn is None:
        return jnp.zeros((num_grid, num_sims), dtype)
    # Broadcast: user terminal functions may return scalars or ignore args.
    return jnp.broadcast_to(
        jnp.asarray(terminal_fn(spot_end[None, :], grid_end[:, None]), dtype),
        (num_grid, num_sims),
    )


def _backward_prep_one(x, num_extra_decisions: int, ratchet_is_step: bool,
                       snap_interp: bool, with_w_mat: bool,
                       uniform_grids: bool = True):
    """Coefficient-INDEPENDENT per-step preparation: decision set, snapped
    interpolation indices/weights, immediate-PV decomposition (and the dense
    hat operator for the Pallas kernels).  None of this depends on the scan
    carry, so it is vmapped over ALL steps before the backward scan — keeping
    ~30 small [G, D]-sized ops per step out of the sequential loop measured
    ~15% of the whole backward pass."""
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
    weights_fn = (
        interp.interp_weights if uniform_grids else interp.interp_weights_general
    )
    idx_lo, w_hi = weights_fn(x["grid_next"], inv_after)  # [G, D]
    if snap_interp:
        # Snapped weights make the hat matrix exactly bf16-representable
        # (2-pass exact interpolation in the kernel); use the same snapped
        # quadrature for the coefficient interpolation so regressed and
        # actual continuations target identical inventories.
        w_hi = decision_kernel.snap_weights(w_hi)
    a, b, _consumed = _decision_cashflow_coeffs(decisions, x)  # [G, D]
    inv_cost_npv = x["inv_cost_rate"] * grid_t * x["df_flow"]  # [G]
    b = b - inv_cost_npv[:, None]
    prep = {"idx_lo": idx_lo, "w_hi": w_hi, "prep_a": a, "prep_b": b}
    if with_w_mat:
        prep["w_mat"] = decision_kernel.interp_weight_matrix(
            idx_lo, w_hi, x["grid_next"].shape[0], grid_t.dtype
        )
    return prep


def _backward_prep_all(per_step, num_extra_decisions: int, ratchet_is_step: bool,
                       snap_interp: bool, with_w_mat: bool,
                       uniform_grids: bool = True):
    """Vectorise ``_backward_prep_one`` over the step axis ([N, ...] arrays)."""
    keys = (
        "grid", "grid_next", "next_min", "next_max", "df_settle", "df_flow",
        "inj_cost", "wdr_cost", "inj_pcnt", "wdr_pcnt", "loss_pcnt",
        "inv_cost_rate", "ratchet_inv", "ratchet_min", "ratchet_max",
    )
    sub = {k: per_step[k] for k in keys}
    return jax.vmap(
        lambda x: _backward_prep_one(
            x, num_extra_decisions, ratchet_is_step, snap_interp, with_w_mat,
            uniform_grids,
        )
    )(sub)


def _interp_coeffs(coeffs, x):
    """Regressed continuation at every (grid, decision) target inventory:
    interpolate in COEFFICIENT space (linear interp commutes with the linear
    model) — replaces a per-decision gather+lerp over [G, S] fitted values."""
    idx_lo, w_hi = x["idx_lo"], x["w_hi"]
    return coeffs[:, idx_lo] * (1 - w_hi) + coeffs[:, idx_lo + 1] * w_hi  # [B, G, D]


def _backward_bodies(
    monomials: tp.Tuple[Monomial, ...],
    num_extra_decisions: int,
    ratchet_is_step: bool,
    axis_name: tp.Optional[str],
    use_pallas: bool,
    snap_interp: bool,
    pred_passes: int,
    fullstep: bool = False,
):
    """Shared backward-step closures for the materialised and streamed scans.

    Returns (fused_body, plain_body).  Both take ``(carry, x)`` where ``x``
    holds the per-step facility scalars, the precomputed prep fields
    (``_backward_prep_all``) and the simulated ``spot`` [S] / ``factors``
    [F, S] for the step (the fused body additionally reads
    ``spot_prev``/``factors_prev`` — previous step's slices, clamped to the
    step itself at t=0)."""
    num_decisions = 2 * num_extra_decisions + 3

    def fullstep_body(carry, x):
        # Kernel v5 (single-device): the whole step — glue solve + decision
        # update + next moments — is ONE pallas_call; the scan body has no
        # XLA math left (docs/ROOFLINE.md round-4 "kernel v5").
        v_act_next, xtx_u, xty_u, c, s = carry
        best_act, xtx_n, xty_n, mean, std, coeffs = (
            decision_kernel.decision_update_fullstep_pallas(
                v_act_next, x["spot"], x["factors"],
                x["spot_prev"], x["factors_prev"],
                xtx_u, xty_u, c, s,
                x["w_mat"], x["prep_a"].T, x["prep_b"].T,
                monomials,
                sim_tile=decision_kernel.pick_sim_tile(x["spot"].shape[0]),
                pred_passes=pred_passes,
            )
        )
        return (best_act, xtx_n, xty_n, mean, std), {
            "mean": mean, "std": std, "coeffs": coeffs,
        }

    def fused_body(carry, x):
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

        ci = _interp_coeffs(coeffs, x)
        a, b = x["prep_a"], x["prep_b"]
        spot = x["spot"]
        best_act, xtx_next, xty_next = decision_kernel.decision_update_moments_pallas(
            v_act_next, spot, x["factors"], x["spot_prev"], x["factors_prev"],
            mean, std, x["w_mat"], jnp.transpose(ci, (2, 1, 0)), a.T, b.T,
            monomials, sim_tile=decision_kernel.pick_sim_tile(spot.shape[0]),
            pred_passes=pred_passes,
        )
        return (best_act, xtx_next, xty_next, mean, std), {
            "mean": mean, "std": std, "coeffs": coeffs,
        }

    if fullstep:
        return fullstep_body, None

    def plain_body(v_act_next, x):
        # Regression of next-period value on this period's state
        # (LsmcStorageValuation.cs:191-212, via normal equations).
        dm = design_matrix(monomials, x["spot"], x["factors"])  # [S, B]
        mean, std = column_stats(dm, axis_name)
        dm_std = (dm - mean) / std
        coeffs = fit_continuation(dm_std, v_act_next.T, axis_name)  # [B, G]

        ci = _interp_coeffs(coeffs, x)
        idx_lo, w_hi = x["idx_lo"], x["w_hi"]
        a, b = x["prep_a"], x["prep_b"]

        spot = x["spot"]  # [S]
        if use_pallas:
            # Fused VMEM-resident decision update: no [G, D, S] HBM temporaries.
            best_act = decision_kernel.decision_update_pallas(
                v_act_next, dm_std.T, spot,
                x["w_mat"], jnp.transpose(ci, (2, 1, 0)), a.T, b.T,
                sim_tile=decision_kernel.pick_sim_tile(spot.shape[0]),
                pred_passes=pred_passes,
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

    return fused_body, plain_body


def _fused_bootstrap(monomials, spot_last, factors_last, v_end, axis_name, dtype):
    """Moments of the LAST step's design matrix against the terminal values,
    standardised with exact two-pass stats (every later step's moments come
    out of the kernel in u-coordinates)."""
    dm_last = design_matrix(monomials, spot_last, factors_last)
    mean0, std0 = column_stats(dm_last, axis_name)
    u0 = (dm_last - mean0) / std0
    hi = jax.lax.Precision.HIGHEST
    xtx0 = jnp.dot(u0.T, u0, preferred_element_type=dtype, precision=hi)
    xty0 = jnp.dot(u0.T, v_end.T, preferred_element_type=dtype, precision=hi)
    return xtx0, xty0, mean0, std0


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
    pred_passes: int = 2,
    uniform_grids: bool = True,
):
    """Backward induction over materialised path panels.  Returns (v0 [G, S]
    values at the first period, regression payload dict of stacked per-step
    arrays [N, ...]).

    ``snap_interp`` rounds interpolation weights to the 1/256 grid (the
    quadrature the Pallas kernel requires for exact 2-pass bf16 interpolation);
    defaults to ``use_pallas`` so the XLA path can be run on the identical
    quadrature for equivalence testing.  ``pred_passes`` selects the number of
    split-precision MXU passes for the regressed-gap matmul in the Pallas
    kernels (2 = centred-gap default, 3 = validated fallback, 1 = exact f32
    VPU accumulation; see ops/decision_kernel._kernel)."""
    if snap_interp is None:
        snap_interp = use_pallas
    elif use_pallas and not snap_interp:
        # The kernel force-snaps the hat matrix to the 1/256 grid regardless
        # (its 2-pass interpolation REQUIRES bf16-exact weights), so
        # unsnapped coefficient interpolation would silently diverge the
        # regressed and actual continuation quadratures (ADVICE r03 item 4).
        import warnings

        warnings.warn(
            "use_pallas=True with snap_interp=False: the Pallas kernel snaps "
            "interpolation weights internally, so the coefficient "
            "interpolation will use a different quadrature than the value "
            "interpolation. Pass snap_interp=True (or leave it None).",
            stacklevel=2,
        )
    grids = arrays["grids"]
    n = grids.shape[0] - 1

    v_end = _terminal_values(
        terminal_fn, spot_reg[n], grids[n], grids.shape[1], spot_reg.shape[1],
        grids.dtype,
    )
    per_step = _backward_per_step(arrays)
    per_step.update(_backward_prep_all(
        per_step, num_extra_decisions, ratchet_is_step, snap_interp,
        with_w_mat=use_pallas, uniform_grids=uniform_grids,
    ))
    per_step["spot"] = spot_reg[:n]
    per_step["factors"] = factors_reg[:n]

    # The fully fused path additionally accumulates the next step's raw
    # regression moments inside the decision kernel (one pass over the value
    # panel instead of two); it needs at least one simulated factor panel to
    # build the design matrix on-tile.
    use_fused_moments = use_pallas and factors_reg.shape[1] > 0
    fullstep = resolve_fullstep(use_fused_moments, axis_name)

    fused_body, plain_body = _backward_bodies(
        monomials, num_extra_decisions, ratchet_is_step, axis_name, use_pallas,
        snap_interp, pred_passes, fullstep=fullstep,
    )

    if use_fused_moments:
        xtx0, xty0, mean0, std0 = _fused_bootstrap(
            monomials, spot_reg[n - 1], factors_reg[n - 1], v_end, axis_name,
            grids.dtype,
        )
        # Previous-step slices (clamped at t=0), consumed by the in-kernel
        # moment accumulation of the NEXT iteration's design matrix: indexed
        # dynamically out of the closed-over panels (shifted-copy panels as
        # scan xs measured ~170 ms slower at the bench config — the extra
        # panel materialisation defeats XLA's buffer reuse).
        per_step["idx"] = jnp.arange(n)

        def fused_body_materialised(carry, x):
            x = dict(x)
            prev = jnp.maximum(x.pop("idx") - 1, 0)
            x["spot_prev"] = jax.lax.dynamic_index_in_dim(
                spot_reg, prev, keepdims=False
            )
            x["factors_prev"] = jax.lax.dynamic_index_in_dim(
                factors_reg, prev, keepdims=False
            )
            return fused_body(carry, x)

        (v0, _, _, _, _), regression = jax.lax.scan(
            fused_body_materialised, (v_end, xtx0, xty0, mean0, std0), per_step,
            reverse=True,
        )
        return v0, regression

    v0, regression = jax.lax.scan(plain_body, v_end, per_step, reverse=True)
    return v0, regression


# ------------------------------------------------------------- streamed sims
#
# The 1M-path headline config cannot materialise [N+1, S] spot plus
# [N+1, F, S] factor panels for two sim sets (~11.7 GB f32 at 1M x 366 — over
# a 16 GB chip; VERDICT r02 item 1).  The per-(step, path) counter RNG
# (models/spot_sim.step_normals) lets the scans regenerate any step's draws in
# place, so the streamed engine holds no path panels at all:
#
# * the FORWARD pass carries the OU factor state [S, F] and regenerates each
#   step's spot on the fly — a trivial carry extension;
# * the BACKWARD pass runs in reverse time, and the OU recursion cannot be
#   reversed stably (the inverse map amplifies f32 rounding by e^{alpha*T} —
#   ~1e7 for the daily gas config), so it uses SEGMENTED CHECKPOINTING: a
#   warmup sweep stores the factor state entering every K-step segment
#   ([ceil(N/K), S, F], ~140 MB at 1M paths, K=32), and the backward scan
#   regenerates each segment forward from its checkpoint with EXACTLY the
#   simulator's own recursion — so streamed and materialised valuations agree
#   bit-for-bit (pinned by tests/test_streaming.py).
#
# HBM high-water at 1M paths: the [G, S] value panel (~400 MB) plus one
# [K, S, F+1] segment panel (~130 MB) — capacity is set by the value panel,
# not the paths.


class StreamedSims(tp.NamedTuple):
    """Inputs for in-scan path regeneration: the OU precompute arrays
    (per simulated period), the RNG base key and this shard's global path ids."""

    decay: jnp.ndarray  # [N+1, F]
    chol: jnp.ndarray  # [N+1, F, F]
    vols: jnp.ndarray  # [N+1, F]
    half_var: jnp.ndarray  # [N+1]
    fwd: jnp.ndarray  # [N+1] simulation forward curve
    key: jax.Array
    path_ids: jnp.ndarray  # [S_local]


def _stream_step_arrays(stream: StreamedSims, n: int) -> tp.Dict[str, jnp.ndarray]:
    """Per-step simulation parameters for steps 0..n-1 plus the previous
    step's spot parameters (row 0 duplicated: the t=0 'previous' step clamps
    to t=0 itself, matching the materialised scan)."""

    def prev(a):
        return jnp.concatenate([a[0:1], a[:-1]], axis=0)

    return {
        "t_idx": jnp.arange(n),
        "sim_decay": stream.decay[:n],
        "sim_chol": stream.chol[:n],
        "sim_fwd": stream.fwd[:n],
        "sim_hv": stream.half_var[:n],
        "sim_vols": stream.vols[:n],
        "sim_fwd_prev": prev(stream.fwd[:n]),
        "sim_hv_prev": prev(stream.half_var[:n]),
        "sim_vols_prev": prev(stream.vols[:n]),
    }


def _stream_draw(stream: StreamedSims, t, antithetic: bool):
    f = stream.decay.shape[1]
    return spot_sim_mod.step_normals(
        stream.key, t, stream.path_ids, f, antithetic, stream.decay.dtype
    )


def _stream_scan_draws(stream: StreamedSims, t_idx, antithetic: bool):
    """Bulk draws for a contiguous block of steps, packaged for in-scan
    consumption: returns ``(xs_extra, get_z)`` where ``xs_extra`` joins the
    scan xs and ``get_z(carry_free_xs_slice)`` yields the step's [F, S]
    draws.  f32 uses the block-half layout (no word-interleave relayout of
    the whole panel — spot_sim.draw_normal_halves); f64 words never straddle
    blocks, so the assembled [T, F, S] panel is free of relayout anyway."""
    f = stream.decay.shape[1]
    dtype = stream.decay.dtype
    if jnp.dtype(dtype) == jnp.float64:
        zs = spot_sim_mod.multi_step_normals(
            stream.key, t_idx[0], t_idx.shape[0], stream.path_ids, f,
            antithetic, dtype,
        )
        return zs, lambda z_slice, t: z_slice
    z1, z2, b0 = spot_sim_mod.draw_normal_halves(
        stream.key, t_idx[0], t_idx.shape[0], stream.path_ids, f, antithetic,
        dtype,
    )
    return t_idx, lambda t_slice, t: spot_sim_mod.step_z_from_halves(
        z1, z2, b0, t, f
    )


def _stream_terminal_state(stream: StreamedSims, x_nm1, n: int, antithetic: bool):
    """Advance the factor state one final step to the end period and price it."""
    z_n = _stream_draw(stream, jnp.asarray(n), antithetic)
    x_n = spot_sim_mod.ou_step(x_nm1, z_n, stream.decay[n], stream.chol[n])
    spot_n = spot_sim_mod.spot_from_state(
        x_n, stream.fwd[n], stream.half_var[n], stream.vols[n]
    )
    return x_n, spot_n


def _stream_warmup(stream: StreamedSims, n: int, seg_len: int, antithetic: bool):
    """One forward sweep of the OU recursion, emitting the state ENTERING each
    full K-step segment (checkpoints [m, S, F]) plus the state entering the
    ragged tail and the final state x_{n-1}."""
    m, r = n // seg_len, n % seg_len
    s = stream.path_ids.shape[0]
    f = stream.decay.shape[1]
    dtype = stream.decay.dtype
    x0 = jnp.zeros((f, s), dtype)

    def chain(x, xs):
        t_idx, d_seg, c_seg = xs
        z_xs, get_z = _stream_scan_draws(stream, t_idx, antithetic)

        def body(xc, one):
            z_or_t, t, d_k, c_k = one
            z = get_z(z_or_t, t)
            return spot_sim_mod.ou_step(xc, z, d_k, c_k), None

        x_out, _ = jax.lax.scan(body, x, (z_xs, t_idx, d_seg, c_seg))
        return x_out

    steps = (jnp.arange(n), stream.decay[:n], stream.chol[:n])
    full = jax.tree.map(lambda a: a[: m * seg_len].reshape((m, seg_len) + a.shape[1:]), steps)
    ragged = jax.tree.map(lambda a: a[m * seg_len :], steps)

    def warm_seg(x, seg_xs):
        return chain(x, seg_xs), x  # emit the segment ENTRY state

    if m > 0:
        x_tail, checkpoints = jax.lax.scan(warm_seg, x0, full)
    else:
        x_tail, checkpoints = x0, jnp.zeros((0, f, s), dtype)
    ragged_entry = x_tail
    x_last = chain(x_tail, ragged) if r > 0 else x_tail  # x_{n-1}
    return checkpoints, ragged_entry, x_last


def _regen_segment(stream: StreamedSims, entry_state, seg, antithetic: bool,
                   is_first_segment, with_prev: bool):
    """Regenerate one segment's spot [L, S] and factors [L, F, S] forward from
    its checkpoint (bit-identical to the simulator's own recursion), plus the
    previous-step slices the fused kernel consumes.  ``is_first_segment`` is a
    traced bool selecting the t=0 clamp (prev = the step itself)."""

    z_xs, get_z = _stream_scan_draws(stream, seg["t_idx"], antithetic)

    def body(x, one):
        z_or_t, one = one
        z = get_z(z_or_t, one["t_idx"])
        x_new = spot_sim_mod.ou_step(x, z, one["sim_decay"], one["sim_chol"])
        spot = spot_sim_mod.spot_from_state(
            x_new, one["sim_fwd"], one["sim_hv"], one["sim_vols"]
        )
        return x_new, (spot, x_new)

    _, (spot_seg, fac_seg) = jax.lax.scan(body, entry_state, (z_xs, seg))
    if not with_prev:
        return spot_seg, fac_seg, None, None
    entry_fac = entry_state  # already [F, S]
    entry_spot = spot_sim_mod.spot_from_state(
        entry_state, seg["sim_fwd_prev"][0], seg["sim_hv_prev"][0],
        seg["sim_vols_prev"][0],
    )
    first_prev_fac = jnp.where(is_first_segment, fac_seg[0], entry_fac)
    first_prev_spot = jnp.where(is_first_segment, spot_seg[0], entry_spot)
    spot_prev = jnp.concatenate([first_prev_spot[None], spot_seg[:-1]], axis=0)
    fac_prev = jnp.concatenate([first_prev_fac[None], fac_seg[:-1]], axis=0)
    return spot_seg, fac_seg, spot_prev, fac_prev


def _process_backward_segment(stream, carry, entry_state, seg, is_first_segment,
                              body, use_fused_moments: bool, antithetic: bool):
    """Regenerate one segment's paths and run the backward bodies over it
    (shared by the fully-jitted scan-over-segments and the host-chunked
    progress/cancellation driver)."""
    spot_seg, fac_seg, spot_prev, fac_prev = _regen_segment(
        stream, entry_state, seg, antithetic, is_first_segment,
        with_prev=use_fused_moments,
    )
    seg = dict(seg)
    seg["spot"] = spot_seg
    seg["factors"] = fac_seg
    if use_fused_moments:
        seg["spot_prev"] = spot_prev
        seg["factors_prev"] = fac_prev
    return jax.lax.scan(body, carry, seg, reverse=True)


def lsmc_backward_streamed(
    arrays: tp.Dict[str, jnp.ndarray],
    stream: StreamedSims,
    monomials: tp.Tuple[Monomial, ...],
    num_extra_decisions: int,
    terminal_fn,
    ratchet_is_step: bool,
    axis_name: tp.Optional[str],
    use_pallas: bool = False,
    snap_interp: tp.Optional[bool] = None,
    pred_passes: int = 2,
    seg_len: int = 16,
    antithetic: bool = False,
    remat: bool = False,
):
    """Backward induction with in-scan path regeneration (no [N, S] panels).
    Bit-identical to ``lsmc_backward`` fed ``simulate_ou_paths`` output.

    ``remat`` wraps each segment in ``jax.checkpoint`` so reverse-mode AD
    through the scan stores only segment-boundary carries ([N/K, G, S])
    instead of every step's residuals — the memory bound that makes the
    adjoint-delta sweep feasible at bench scale."""
    if snap_interp is None:
        snap_interp = use_pallas
    elif use_pallas and not snap_interp:
        # Same hazard as lsmc_backward: the kernel force-snaps the hat
        # matrix, so unsnapped coefficient interpolation silently diverges
        # the two continuation quadratures (ADVICE r03 item 4).
        import warnings

        warnings.warn(
            "use_pallas=True with snap_interp=False: the Pallas kernel snaps "
            "interpolation weights internally, so the coefficient "
            "interpolation will use a different quadrature than the value "
            "interpolation. Pass snap_interp=True (or leave it None).",
            stacklevel=2,
        )
    grids = arrays["grids"]
    n = grids.shape[0] - 1
    seg_len = max(1, min(seg_len, n))
    m, r = n // seg_len, n % seg_len
    num_grid = grids.shape[1]
    s = stream.path_ids.shape[0]
    dtype = grids.dtype

    use_fused_moments = use_pallas and stream.decay.shape[1] > 0
    fused_body, plain_body = _backward_bodies(
        monomials, num_extra_decisions, ratchet_is_step, axis_name, use_pallas,
        snap_interp, pred_passes,
    )

    checkpoints, ragged_entry, x_last = _stream_warmup(
        stream, n, seg_len, antithetic
    )
    spot_last = spot_sim_mod.spot_from_state(
        x_last, stream.fwd[n - 1], stream.half_var[n - 1], stream.vols[n - 1]
    )
    _, spot_end = _stream_terminal_state(stream, x_last, n, antithetic)
    v_end = _terminal_values(terminal_fn, spot_end, grids[n], num_grid, s, dtype)

    per_step = _backward_per_step(arrays)
    per_step.update(_backward_prep_all(
        per_step, num_extra_decisions, ratchet_is_step, snap_interp,
        with_w_mat=use_pallas,
    ))
    per_step.update(_stream_step_arrays(stream, n))
    full_steps = jax.tree.map(
        lambda a: a[: m * seg_len].reshape((m, seg_len) + a.shape[1:]), per_step
    )
    ragged_steps = jax.tree.map(lambda a: a[m * seg_len :], per_step)

    if use_fused_moments:
        xtx0, xty0, mean0, std0 = _fused_bootstrap(
            monomials, spot_last, x_last, v_end, axis_name, dtype
        )
        carry = (v_end, xtx0, xty0, mean0, std0)
        body = fused_body
    else:
        carry = v_end
        body = plain_body

    def process_segment(carry, entry_state, seg, is_first_segment):
        return _process_backward_segment(
            stream, carry, entry_state, seg, is_first_segment, body,
            use_fused_moments, antithetic,
        )

    if remat:
        process_segment = jax.checkpoint(process_segment, prevent_cse=False)

    reg_ragged = None
    if r > 0:
        carry, reg_ragged = process_segment(
            carry, ragged_entry, ragged_steps, jnp.asarray(m == 0)
        )

    if m > 0:
        def outer_body(carry, seg_xs):
            seg_idx, entry_state, seg = seg_xs
            return process_segment(carry, entry_state, seg, seg_idx == 0)

        carry, reg_full = jax.lax.scan(
            outer_body, carry, (jnp.arange(m), checkpoints, full_steps),
            reverse=True,
        )
        # [m, K, ...] -> [m*K, ...]
        reg_full = jax.tree.map(
            lambda a: a.reshape((m * seg_len,) + a.shape[2:]), reg_full
        )
    else:
        reg_full = None

    if reg_full is None:
        regression = reg_ragged
    elif reg_ragged is None:
        regression = reg_full
    else:
        regression = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), reg_full, reg_ragged
        )

    v0 = carry[0] if use_fused_moments else carry
    return v0, regression


def _trigger_outputs(x, xbar, expected_inventory, ratchet_is_step: bool,
                     num_extra_decisions: int, dtype, uniform_grids: bool = True):
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
            iv = (
                interp.interp_vector if uniform_grids
                else interp.interp_vector_general
            )
            cont_v = iv(
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
        return (
            volumes, prices,
            jnp.where(active, extreme, nan),
            jnp.where(active, prices[-1], nan),  # price at the max volume
            jnp.where(active, prices[0], nan),   # price nearest the alternative
        )

    inj_volumes, inj_prices, max_inj_vol, max_inj_price, _inj_near = side(True)
    wdr_volumes, wdr_prices, max_wdr_vol, wdr_maxvol_price, wdr_near_price = side(False)
    return {
        "inj_volumes": inj_volumes,
        "inj_prices": inj_prices,
        "wdr_volumes": wdr_volumes,
        "wdr_prices": wdr_prices,
        "max_inj_vol": max_inj_vol,
        # Inject: the reference's MaxInjectTriggerPrice IS the max-volume
        # point (the last entry of the ascending volume scan,
        # LsmcStorageValuation.cs:556).
        "max_inj_price": max_inj_price,
        "max_wdr_vol": max_wdr_vol,
        # Withdraw: the reference reports the price at the volume ONE
        # INCREMENT from the alternative (withdrawTriggerPrices[0] of the
        # reversed scan, LsmcStorageValuation.cs:584) in the like-named
        # column; the max-volume figure is kept under a distinct key.
        "max_wdr_price": wdr_near_price,
        "wdr_maxvol_price": wdr_maxvol_price,
    }


def _forward_per_step(
    arrays: tp.Dict[str, jnp.ndarray],
    regression: tp.Dict[str, jnp.ndarray],
    fused: bool,
) -> tp.Dict[str, jnp.ndarray]:
    """Per-step facility/regression arrays feeding the forward scan."""
    grids = arrays["grids"]
    n = grids.shape[0] - 1
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
        "mean": regression["mean"],
        "std": regression["std"],
        "coeffs": regression["coeffs"],
    }
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
    return per_step


def _forward_bodies(
    monomials: tp.Tuple[Monomial, ...],
    num_extra_decisions: int,
    discount_deltas: bool,
    ratchet_is_step: bool,
    axis_name: tp.Optional[str],
    return_sim_data: bool,
    s_local: int,
    sim_tile: int,
    dtype,
    fwd_pred_passes: int = 2,
    uniform_grids: bool = True,
):
    """Shared forward-step closures (fused Pallas / plain XLA) for the
    materialised and streamed scans.  Bodies take ``(carry, x)`` with carry
    (inventory [S], pv [S]) and ``x`` holding per-step arrays plus ``spot``
    [S] and ``factors`` [F, S]."""
    num_decisions = 2 * num_extra_decisions + 3

    def forward_step_fused(carry, x):
        inventory, pv = carry  # [S], [S]
        new_inv, new_pv, _opt_dec, _opt_cons, sums, xbar_sum = (
            forward_kernel.forward_step_pallas(
                x["params"], x["mean"], x["std"],
                x["ratchet_inv"], x["ratchet_min"], x["ratchet_max"],
                x["spot"], x["factors"], inventory, pv, x["coeffs"],
                monomials, num_extra_decisions, ratchet_is_step, sim_tile,
                pred_passes=fwd_pred_passes,
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
                num_extra_decisions, dtype, uniform_grids,
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
        per_sim_interp = (
            interp.interp_per_sim if uniform_grids
            else interp.interp_per_sim_general
        )
        cont = per_sim_interp(x["grid_next"], c_reg, inv_after)  # [S, D]

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
                num_extra_decisions, dtype, uniform_grids,
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

    return forward_step_fused, forward_step


def _forward_finalise(
    outputs,
    final_inventory,
    pv_by_sim,
    spot_end,  # [S] end-period spot (for the terminal value)
    terminal_fn,
    axis_name,
    return_sim_data: bool,
    s_local: int,
    dtype,
):
    """Terminal value, NPV/SE reductions and result assembly shared by the
    materialised and streamed forward passes."""
    # Terminal period PV for non-empty storage (corrected semantics; see module
    # docstring re LsmcStorageValuation.cs:594-612).
    if terminal_fn is not None:
        terminal_pv = jnp.broadcast_to(
            jnp.asarray(terminal_fn(spot_end, final_inventory), dtype),
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
        "withdraw_max_volume_price": outputs["wdr_maxvol_price"],
        **sim_panels,
    }


def _resolve_forward_fused(use_pallas, return_sim_data, dtype, sim_tile):
    return bool(
        use_pallas and not return_sim_data and dtype == jnp.float32
        and sim_tile > 0
    )


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
    fwd_pred_passes: int = 2,
    uniform_grids: bool = True,
):
    """Forward simulation over materialised path panels."""
    grids = arrays["grids"]
    n = grids.shape[0] - 1
    dtype = grids.dtype
    s_local = spot_val.shape[1]
    sim_tile = forward_kernel.pick_fwd_sim_tile(s_local)
    fused = _resolve_forward_fused(use_pallas, return_sim_data, dtype, sim_tile)

    per_step = _forward_per_step(arrays, regression, fused)
    per_step["spot"] = spot_val[:n]
    per_step["factors"] = factors_val[:n]

    fused_body, plain_body = _forward_bodies(
        monomials, num_extra_decisions, discount_deltas, ratchet_is_step,
        axis_name, return_sim_data, s_local, sim_tile, dtype,
        fwd_pred_passes=fwd_pred_passes, uniform_grids=uniform_grids,
    )

    inv0 = jnp.full((s_local,), jnp.asarray(starting_inventory, dtype))
    pv0 = jnp.zeros((s_local,), dtype)
    (final_inventory, pv_by_sim), outputs = jax.lax.scan(
        fused_body if fused else plain_body, (inv0, pv0), per_step
    )
    return _forward_finalise(
        outputs, final_inventory, pv_by_sim, spot_val[n], terminal_fn,
        axis_name, return_sim_data, s_local, dtype,
    )


def _stream_forward_segment_scan(stream, carry, seg, body, antithetic):
    """Scan one streamed-forward segment: bulk-draw the whole segment's
    normals in ONE hash call (per-step draws inside the scan SEQUENTIALISE
    the threefry hashing, measured ~70 ms per 262k-path sweep), then step
    the OU state alongside the inventory/pv carry.  Values are bit-identical
    to per-step drawing.  Shared by the fully-jitted forward scan and the
    host-chunked segment driver so the two streamed forward bodies cannot
    diverge (the backward pass shares _process_backward_segment for the
    same reason)."""
    z_xs, get_z = _stream_scan_draws(stream, seg["t_idx"], antithetic)

    def streamed_body(c, one):
        z_or_t, x = one
        inventory, pv, x_state = c
        z = get_z(z_or_t, x["t_idx"])
        x_new = spot_sim_mod.ou_step(x_state, z, x["sim_decay"], x["sim_chol"])
        x = dict(x)
        x["spot"] = spot_sim_mod.spot_from_state(
            x_new, x["sim_fwd"], x["sim_hv"], x["sim_vols"]
        )
        x["factors"] = x_new  # [F, S] state layout
        (new_inventory, new_pv), outputs = body((inventory, pv), x)
        return (new_inventory, new_pv, x_new), outputs

    return jax.lax.scan(streamed_body, carry, (z_xs, seg))


def lsmc_forward_streamed(
    arrays: tp.Dict[str, jnp.ndarray],
    stream: StreamedSims,
    regression: tp.Dict[str, jnp.ndarray],
    starting_inventory,
    monomials: tp.Tuple[Monomial, ...],
    num_extra_decisions: int,
    discount_deltas: bool,
    terminal_fn,
    ratchet_is_step: bool,
    axis_name: tp.Optional[str],
    use_pallas: bool = False,
    antithetic: bool = False,
    remat: bool = False,
    seg_len: int = 16,
    fwd_pred_passes: int = 2,
):
    """Forward simulation with in-scan path regeneration: the scan carries the
    OU factor state and prices each step on the fly, so no [N, S] valuation
    panels exist.  Bit-identical to ``lsmc_forward`` fed ``simulate_ou_paths``
    output.  Per-sim panels are unavailable by construction
    (``return_sim_data`` is materialised-only).  ``remat`` chunks the scan
    into ``seg_len``-step segments wrapped in ``jax.checkpoint`` (AD tape
    bounded by segment-boundary carries)."""
    grids = arrays["grids"]
    n = grids.shape[0] - 1
    dtype = grids.dtype
    s_local = stream.path_ids.shape[0]
    f = stream.decay.shape[1]
    sim_tile = forward_kernel.pick_fwd_sim_tile(s_local)
    fused = _resolve_forward_fused(use_pallas, False, dtype, sim_tile)

    per_step = _forward_per_step(arrays, regression, fused)
    per_step.update(_stream_step_arrays(stream, n))

    fused_body, plain_body = _forward_bodies(
        monomials, num_extra_decisions, discount_deltas, ratchet_is_step,
        axis_name, False, s_local, sim_tile, dtype,
        fwd_pred_passes=fwd_pred_passes,
    )
    body = fused_body if fused else plain_body

    def seg_scan_plain(carry, seg_xs):
        return _stream_forward_segment_scan(stream, carry, seg_xs, body, antithetic)

    inv0 = jnp.full((s_local,), jnp.asarray(starting_inventory, dtype))
    pv0 = jnp.zeros((s_local,), dtype)
    x0 = jnp.zeros((f, s_local), dtype)
    seg = max(1, min(seg_len, n))
    m, r = n // seg, n % seg
    seg_scan = (
        jax.checkpoint(seg_scan_plain, prevent_cse=False) if remat
        else seg_scan_plain
    )
    full = jax.tree.map(
        lambda a: a[: m * seg].reshape((m, seg) + a.shape[1:]), per_step
    )
    ragged = jax.tree.map(lambda a: a[m * seg :], per_step)
    carry = (inv0, pv0, x0)
    ys_full = None
    if m > 0:
        carry, ys_full = jax.lax.scan(seg_scan, carry, full)
        ys_full = jax.tree.map(
            lambda a: a.reshape((m * seg,) + a.shape[2:]), ys_full
        )
    ys_ragged = None
    if r > 0:
        carry, ys_ragged = seg_scan(carry, ragged)
    if ys_full is None:
        outputs = ys_ragged
    elif ys_ragged is None:
        outputs = ys_full
    else:
        outputs = jax.tree.map(
            lambda a, b: jnp.concatenate([a, b], axis=0), ys_full, ys_ragged
        )
    final_inventory, pv_by_sim, x_last = carry
    _, spot_end = _stream_terminal_state(stream, x_last, n, antithetic)
    return _forward_finalise(
        outputs, final_inventory, pv_by_sim, spot_end, terminal_fn,
        axis_name, False, s_local, dtype,
    )


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
        "pred_passes",
        "uniform_grids",
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
    pred_passes: int = 2,
    uniform_grids: bool = True,
) -> tp.Dict[str, jnp.ndarray]:
    use_pallas = use_pallas and not has_generic(monomials)  # generic basis -> XLA path
    if not uniform_grids:
        # The fused Pallas kernels compute grid positions arithmetically
        # (uniform spacing); non-uniform user grids take the general-interp
        # XLA path.
        use_pallas = False
    v0, regression = lsmc_backward(
        arrays, spot_reg, factors_reg, monomials, num_extra_decisions, terminal_fn,
        ratchet_is_step, axis_name, use_pallas=use_pallas, snap_interp=snap_interp,
        pred_passes=pred_passes, uniform_grids=uniform_grids,
    )
    result = lsmc_forward(
        arrays, spot_val, factors_val, regression, starting_inventory, monomials,
        num_extra_decisions, discount_deltas, terminal_fn, ratchet_is_step, axis_name,
        return_sim_data, use_pallas=use_pallas, uniform_grids=uniform_grids,
        fwd_pred_passes=pred_passes,
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
        "monomials",
        "num_extra_decisions",
        "discount_deltas",
        "terminal_fn",
        "ratchet_is_step",
        "axis_name",
        "use_pallas",
        "return_regression",
        "snap_interp",
        "pred_passes",
        "seg_len",
        "antithetic",
        "same_sims",
    ),
)
def lsmc_core_streamed(
    arrays: tp.Dict[str, jnp.ndarray],
    sim_inputs: tp.Dict[str, jnp.ndarray],  # decay/chol/vols/half_var/fwd [N+1,...]
    reg_key: jax.Array,
    val_key: jax.Array,
    path_ids: jnp.ndarray,
    starting_inventory,
    monomials: tp.Tuple[Monomial, ...],
    num_extra_decisions: int,
    discount_deltas: bool,
    terminal_fn,
    ratchet_is_step: bool,
    axis_name: tp.Optional[str] = None,
    use_pallas: bool = False,
    return_regression: bool = False,
    snap_interp: tp.Optional[bool] = None,
    pred_passes: int = 2,
    seg_len: int = 16,
    antithetic: bool = False,
    same_sims: bool = False,
) -> tp.Dict[str, jnp.ndarray]:
    """Full LSMC valuation with in-scan path regeneration: the only [·, S]
    array alive across steps is the value panel [G, S] — no spot/factor panels
    — so the 1M-path headline config fits a single chip (VERDICT r02 item 1).
    Dual-sim estimator as in ``lsmc_core``: ``reg_key`` drives the backward
    regression sims, ``val_key`` the independent forward valuation sims
    (``same_sims`` reuses the regression stream)."""
    use_pallas = use_pallas and not has_generic(monomials)  # generic basis -> XLA path
    reg_stream = StreamedSims(
        decay=sim_inputs["decay"], chol=sim_inputs["chol"],
        vols=sim_inputs["vols"], half_var=sim_inputs["half_var"],
        fwd=sim_inputs["fwd"], key=reg_key, path_ids=path_ids,
    )
    val_stream = reg_stream._replace(key=reg_key if same_sims else val_key)
    v0, regression = lsmc_backward_streamed(
        arrays, reg_stream, monomials, num_extra_decisions, terminal_fn,
        ratchet_is_step, axis_name, use_pallas=use_pallas,
        snap_interp=snap_interp, pred_passes=pred_passes, seg_len=seg_len,
        antithetic=antithetic,
    )
    result = lsmc_forward_streamed(
        arrays, val_stream, regression, starting_inventory, monomials,
        num_extra_decisions, discount_deltas, terminal_fn, ratchet_is_step,
        axis_name, use_pallas=use_pallas, antithetic=antithetic,
        fwd_pred_passes=pred_passes,
    )
    result["backward_npv"] = _global_mean_over_sims(v0[0], axis_name)
    if return_regression:
        result["regression_mean"] = regression["mean"]
        result["regression_std"] = regression["std"]
        result["regression_coeffs"] = regression["coeffs"]
    return result


@partial(
    jax.jit,
    static_argnames=(
        "monomials", "num_extra_decisions", "discount_deltas", "terminal_fn",
        "ratchet_is_step", "axis_name", "use_pallas", "uniform_grids", "pred_passes",
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
    use_pallas: bool = False,
    uniform_grids: bool = True,
    pred_passes: int = 2,
):
    """NPV and deltas by automatic differentiation through the valuation.

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

    Structure mirrors the streamed variant: the BACKWARD pass runs outside
    ``value_and_grad`` (its regression payload only reaches the NPV through
    the gradient-dead argmax, so it is ``stop_gradient``-ed) — which both
    shrinks the tape and lets it use the fused Pallas kernel on TPU.
    """
    use_pallas = (
        use_pallas and uniform_grids and not has_generic(monomials)
    )  # generic basis / non-uniform grids -> XLA path
    fwd = arrays["fwd"]
    spot_reg = fwd[:, None] * stoch_reg
    v0, regression = lsmc_backward(
        arrays, spot_reg, factors_reg, monomials, num_extra_decisions,
        terminal_fn, ratchet_is_step, axis_name, use_pallas=use_pallas,
        uniform_grids=uniform_grids, pred_passes=pred_passes,
    )
    regression = jax.tree.map(jax.lax.stop_gradient, regression)
    # The differentiated forward runs COLLECTIVE-FREE per shard and the
    # value/gradient are pmean'd explicitly: differentiating through
    # psum/pmean under shard_map has an ill-defined transpose (the streamed
    # variant documents the shard-count-dependent gradients an earlier
    # version produced).  Equal shard sizes make the explicit means exact.
    npv_local, grad_local = _forward_value_and_grad(
        arrays, regression, stoch_val, factors_val, starting_inventory,
        monomials, num_extra_decisions, terminal_fn, ratchet_is_step,
        None, uniform_grids=uniform_grids,
    )
    npv = _pmean(npv_local, axis_name)
    grad_fwd = _pmean(grad_local, axis_name)
    return _undiscount_deltas(arrays, npv, grad_fwd, discount_deltas)


def _forward_value_and_grad(
    arrays, regression, stoch_val, factors_val, starting_inventory, monomials,
    num_extra_decisions, terminal_fn, ratchet_is_step, axis_name,
    uniform_grids: bool = True,
):
    """``(npv, d npv / d fwd)`` of the forward pass with a FIXED (already
    ``stop_gradient``-ed) regression payload: the shared adjoint core for
    the materialised, path-chunked, and mesh-sharded sweeps.  The general
    (non-uniform-grid) interpolation path is searchsorted + gather — fully
    differentiable, so ``uniform_grids=False`` composes."""
    fwd = arrays["fwd"]

    def npv_of_fwd(fwd_v):
        arr = dict(arrays)
        arr["fwd"] = fwd_v
        spot_val = fwd_v[:, None] * stoch_val
        result = lsmc_forward(
            arr, spot_val, factors_val, regression, starting_inventory,
            monomials, num_extra_decisions, False, terminal_fn,
            ratchet_is_step, axis_name, False, uniform_grids=uniform_grids,
        )
        return result["npv"]

    return jax.value_and_grad(npv_of_fwd)(fwd)


def _undiscount_deltas(arrays, npv, grad_fwd, discount_deltas: bool):
    if discount_deltas:
        # value_and_grad discounts to the valuation date already.
        return npv, grad_fwd
    # The reference's DiscountDeltas=False divides the discount back out.
    fwd = arrays["fwd"]
    df = jnp.concatenate([arrays["df_settle"], jnp.ones((1,), fwd.dtype)])
    return npv, grad_fwd / df


@partial(
    jax.jit,
    static_argnames=(
        "monomials", "num_extra_decisions", "terminal_fn", "ratchet_is_step",
        "uniform_grids",
    ),
)
def _forward_ad_chunk_jit(
    arrays, regression, spot_val_chunk, factors_val_chunk, starting_inventory,
    monomials, num_extra_decisions, terminal_fn, ratchet_is_step,
    uniform_grids: bool = True,
):
    """One path chunk of the host-fed adjoint sweep: reconstruct the
    stochastic part, differentiate the forward pass, return the chunk's
    (npv, grad) pair."""
    stoch_val = spot_val_chunk / arrays["fwd"][:, None]
    return _forward_value_and_grad(
        arrays, regression, stoch_val, factors_val_chunk, starting_inventory,
        monomials, num_extra_decisions, terminal_fn, ratchet_is_step,
        None, uniform_grids=uniform_grids,
    )


def lsmc_ad_deltas_path_chunked(
    arrays: tp.Dict[str, jnp.ndarray],
    regression: tp.Dict[str, np.ndarray],  # mean/std/coeffs from the backward
    spot_val: np.ndarray,      # [N+1, S] HOST numpy valuation spot panel
    factors_val: np.ndarray,   # [N+1, F, S] HOST numpy
    starting_inventory,
    monomials: tp.Tuple[Monomial, ...],
    num_extra_decisions: int,
    discount_deltas: bool,
    terminal_fn,
    ratchet_is_step: bool,
    uniform_grids: bool = True,
    chunk_sims: int = 65536,
):
    """Adjoint deltas over HOST-RESIDENT user panels too large for device
    memory (the ``value_from_sims`` host-streamed scale): the NPV is a mean
    over sims and the regression payload is fixed, so the gradient decomposes
    over path chunks — run ``value_and_grad`` of the forward pass per
    device-sized chunk fed from numpy, and average.  Memory is bounded by one
    chunk's panels plus its AD tape; results are identical (f-dtype mean
    associativity aside) to the materialised sweep.  Completes the adjoint
    matrix for host-streamed panels (VERDICT r04 item 2)."""
    n_total = spot_val.shape[1]
    dtype = arrays["grids"].dtype
    inv0 = jnp.asarray(starting_inventory, dtype)
    regression = {k: jnp.asarray(v) for k, v in regression.items()}
    npv_sum = None
    grad_sum = None
    done = 0
    while done < n_total:
        take = min(chunk_sims, n_total - done)
        spot_c = jnp.asarray(spot_val[:, done : done + take], dtype)
        fac_c = jnp.asarray(factors_val[:, :, done : done + take], dtype)
        npv_c, grad_c = _forward_ad_chunk_jit(
            arrays, regression, spot_c, fac_c, inv0, monomials,
            num_extra_decisions, terminal_fn, ratchet_is_step,
            uniform_grids=uniform_grids,
        )
        w = float(take)
        npv_sum = npv_c * w if npv_sum is None else npv_sum + npv_c * w
        grad_sum = grad_c * w if grad_sum is None else grad_sum + grad_c * w
        done += take
    npv = npv_sum / n_total
    grad_fwd = grad_sum / n_total
    return _undiscount_deltas(arrays, npv, grad_fwd, discount_deltas)


@partial(
    jax.jit,
    static_argnames=(
        "monomials", "num_extra_decisions", "discount_deltas", "terminal_fn",
        "ratchet_is_step", "axis_name", "seg_len", "antithetic", "same_sims",
        "use_pallas", "pred_passes",
    ),
)
def lsmc_npv_and_ad_deltas_streamed(
    arrays: tp.Dict[str, jnp.ndarray],
    sim_inputs: tp.Dict[str, jnp.ndarray],
    reg_key: jax.Array,
    val_key: jax.Array,
    path_ids: jnp.ndarray,
    starting_inventory,
    monomials: tp.Tuple[Monomial, ...],
    num_extra_decisions: int,
    discount_deltas: bool,
    terminal_fn,
    ratchet_is_step: bool,
    axis_name: tp.Optional[str] = None,
    seg_len: int = 16,
    antithetic: bool = False,
    same_sims: bool = False,
    use_pallas: bool = False,
    pred_passes: int = 2,
):
    """Adjoint deltas with streamed sims and segment rematerialisation
    (VERDICT r02 item 3: the sharded, memory-bounded adjoint sweep).

    Structure: the BACKWARD pass runs un-differentiated with globally psum'd
    moments (the policy is exactly gradient-dead: the forward NPV depends on
    the regression payload only through the discrete argmax, so AD through it
    contributes zero a.e. — the envelope argument the materialised
    ``lsmc_npv_and_ad_deltas`` relies on implicitly).  ``value_and_grad``
    then runs over the FORWARD pass only, per shard with no collectives in
    the differentiated graph (``axis_name=None``, regression payload
    ``stop_gradient``-ed), and value/gradient are pmean'd explicitly — this
    sidesteps the ill-defined transpose of collectives under ``shard_map``
    (an earlier version differentiated through psums and produced
    shard-count-dependent gradients).  The forward curve enters the graph as
    the simulation curve (spot_t = fwd_t·exp(x·σ − ½V), so d spot/d fwd =
    spot/fwd exactly — the reference's pathwise assumption,
    LsmcStorageValuation.cs:514-517, holds by construction).  Segment
    ``jax.checkpoint`` bounds the AD tape to segment-boundary carries.  The
    backward pass may use the Pallas kernels (no gradient flows through it);
    the differentiated forward sweep always runs the XLA body (Pallas
    defines no VJP)."""
    use_pallas = use_pallas and not has_generic(monomials)  # generic basis -> XLA path
    inv0 = jnp.asarray(starting_inventory, arrays["grids"].dtype)
    fwd = sim_inputs["fwd"]

    reg_stream = StreamedSims(
        decay=sim_inputs["decay"], chol=sim_inputs["chol"],
        vols=sim_inputs["vols"], half_var=sim_inputs["half_var"],
        fwd=fwd, key=reg_key, path_ids=path_ids,
    )
    val_stream = reg_stream._replace(key=reg_key if same_sims else val_key)
    # The backward pass sits OUTSIDE value_and_grad (its payload is
    # stop_gradient-ed below), so it may run the fused Pallas kernel: the
    # adjoint then prices with the SAME policy quadrature as the pricing run,
    # and the sweep no longer pays the 5.5x XLA-backward penalty (the
    # differentiated FORWARD below must stay XLA — Pallas defines no VJP).
    _v0, regression = lsmc_backward_streamed(
        arrays, reg_stream, monomials, num_extra_decisions, terminal_fn,
        ratchet_is_step, axis_name, use_pallas=use_pallas, seg_len=seg_len,
        antithetic=antithetic, pred_passes=pred_passes,
    )
    regression = jax.tree.map(jax.lax.stop_gradient, regression)

    def local_npv(fwd_v):
        arr = dict(arrays)
        arr["fwd"] = fwd_v
        result = lsmc_forward_streamed(
            arr, val_stream._replace(fwd=fwd_v), regression, inv0, monomials,
            num_extra_decisions, False, terminal_fn, ratchet_is_step,
            axis_name=None, use_pallas=False, antithetic=antithetic,
            remat=True, seg_len=seg_len,
        )
        return result["npv"]  # this shard's local mean PV

    npv_local, grad_local = jax.value_and_grad(local_npv)(fwd)
    # Equal shard sizes (enforced by the mesh wrapper): global mean PV and
    # its gradient are the plain across-shard means.
    npv = _pmean(npv_local, axis_name)
    grad_fwd = _pmean(grad_local, axis_name)
    return _undiscount_deltas(arrays, npv, grad_fwd, discount_deltas)


def build_engine_arrays(
    compiled: CompiledStorage,
    fwd: np.ndarray,
    df_settle: np.ndarray,
    df_flow: np.ndarray,
    inventory_lower: np.ndarray,
    inventory_upper: np.ndarray,
    num_grid_points: int,
    dtype,
    grid_calc=None,
) -> tp.Dict[str, jnp.ndarray]:
    if grid_calc is not None:
        # User per-period grids (IDoubleStateSpaceGridCalc.cs:32 analog).
        grids = gridmod.inventory_grids_custom(
            inventory_lower, inventory_upper, grid_calc
        )
    else:
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


# ---------------------------------------------------- host-chunked execution
#
# Reference-granularity progress + cancellation (LsmcStorageValuation.cs
# :343-345,521 polls once per period; a compiled scan cannot call the host).
# The streamed engine's segment structure makes a host-driven variant cheap:
# the backward/forward scans execute segment-by-segment from Python, with the
# host invoking a callback between segments — progress every ``seg_len``
# steps and cooperative cancellation with bounded latency, at the cost of one
# dispatch per segment (~23 dispatches for the daily benchmark; no measurable
# slowdown, pinned by tests/test_progress_cancellation.py).


@partial(jax.jit, static_argnames=("seg_len", "antithetic"))
def _stream_warmup_jit(stream: StreamedSims, seg_len: int, antithetic: bool):
    n = stream.decay.shape[0] - 1
    seg_len = max(1, min(seg_len, n))
    return _stream_warmup(stream, n, seg_len, antithetic)


@partial(
    jax.jit,
    static_argnames=("monomials", "terminal_fn", "axis_name", "fused", "antithetic"),
)
def _backward_init_streamed_jit(
    arrays, stream: StreamedSims, x_last,
    *, monomials, terminal_fn, axis_name, fused, antithetic,
):
    grids = arrays["grids"]
    n = grids.shape[0] - 1
    dtype = grids.dtype
    s = stream.path_ids.shape[0]
    _, spot_end = _stream_terminal_state(stream, x_last, n, antithetic)
    v_end = _terminal_values(terminal_fn, spot_end, grids[n], grids.shape[1], s, dtype)
    if not fused:
        return v_end
    spot_last = spot_sim_mod.spot_from_state(
        x_last, stream.fwd[n - 1], stream.half_var[n - 1], stream.vols[n - 1]
    )
    xtx0, xty0, mean0, std0 = _fused_bootstrap(
        monomials, spot_last, x_last, v_end, axis_name, dtype
    )
    return (v_end, xtx0, xty0, mean0, std0)


_BWD_SEG_STATICS = (
    "monomials", "num_extra_decisions", "ratchet_is_step", "axis_name",
    "use_pallas", "snap_interp", "pred_passes", "antithetic", "fused",
)


@partial(jax.jit, static_argnames=_BWD_SEG_STATICS)
def _backward_segment_chunk_jit(
    stream: StreamedSims, carry, entry_state, seg, is_first,
    *, monomials, num_extra_decisions, ratchet_is_step, axis_name, use_pallas,
    snap_interp, pred_passes, antithetic, fused,
):
    fused_body, plain_body = _backward_bodies(
        monomials, num_extra_decisions, ratchet_is_step, axis_name, use_pallas,
        snap_interp, pred_passes,
    )
    return _process_backward_segment(
        stream, carry, entry_state, seg, is_first,
        fused_body if fused else plain_body, fused, antithetic,
    )


_FWD_SEG_STATICS = (
    "monomials", "num_extra_decisions", "discount_deltas", "ratchet_is_step",
    "axis_name", "antithetic", "fused", "fwd_pred_passes",
)


@partial(jax.jit, static_argnames=_FWD_SEG_STATICS)
def _forward_segment_chunk_jit(
    stream: StreamedSims, carry, seg,
    *, monomials, num_extra_decisions, discount_deltas, ratchet_is_step,
    axis_name, antithetic, fused, fwd_pred_passes=2,
):
    s_local = stream.path_ids.shape[0]
    dtype = carry[0].dtype
    sim_tile = forward_kernel.pick_fwd_sim_tile(s_local)
    fused_body, plain_body = _forward_bodies(
        monomials, num_extra_decisions, discount_deltas, ratchet_is_step,
        axis_name, False, s_local, sim_tile, dtype,
        fwd_pred_passes=fwd_pred_passes,
    )
    body = fused_body if fused else plain_body
    return _stream_forward_segment_scan(stream, carry, seg, body, antithetic)


# ------------------- multi-device host-chunked execution (VERDICT r04 item 6)
#
# The host-chunked drivers dispatch one jitted call per seg_len-step segment.
# On a multi-device host each segment call is wrapped in a shard_map over the
# local 1-D path mesh: carries with a trailing sim axis stay device-sharded
# between segments, per-step parameters are replicated, and the engine bodies
# run with axis_name = the mesh axis so the regression reductions psum exactly
# as in the non-chunked sharded path.  One boundary subtlety: the fused
# backward carry holds PER-SHARD partial moments (each step's kernel
# accumulates local partials; fused_body psums them at the START of the next
# step).  A shard-varying value with no sim axis cannot cross a shard_map
# boundary, so the wrappers pmean the moment leaves at segment exit — the next
# segment's first-step psum then yields n_dev * pmean = the exact global sum.

_MESH_AXIS = "paths"  # == parallel.mesh.AXIS (literal: avoids a module cycle)


class _ChunkedMeshCalls:
    """shard_map-per-segment wrappers for the host-chunked drivers."""

    def __init__(self, mesh, fused: bool):
        from jax.sharding import PartitionSpec

        self.mesh = mesh
        self.fused = fused
        self.P = PartitionSpec
        ax = _MESH_AXIS
        self.stream_spec = StreamedSims(
            decay=self.P(), chol=self.P(), vols=self.P(), half_var=self.P(),
            fwd=self.P(), key=self.P(), path_ids=self.P(ax),
        )
        self.carry_spec = (
            (self.P(None, ax), self.P(), self.P(), self.P(), self.P())
            if fused else self.P(None, ax)
        )
        self.row_spec = self.P(ax)          # [S]
        self.state_spec = self.P(None, ax)  # [F, S] / [G, S]

    def _pmean_moments(self, carry):
        if not self.fused:
            return carry
        v, xtx, xty, mean, std = carry
        return (
            v,
            jax.lax.pmean(xtx, _MESH_AXIS),
            jax.lax.pmean(xty, _MESH_AXIS),
            mean, std,
        )

    def _map(self, fn, in_specs, out_specs):
        return jax.shard_map(
            fn, mesh=self.mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=False,
        )

    # ---- streamed driver -------------------------------------------------
    def warmup(self, stream, seg_len, antithetic):
        P, ax = self.P, _MESH_AXIS
        fn = lambda st: _stream_warmup_jit(st, seg_len, antithetic)
        return self._map(
            fn, (self.stream_spec,),
            (P(None, None, ax), self.state_spec, self.state_spec),
        )(stream)

    def init_streamed(self, arrays, stream, x_last, **statics):
        def fn(arr, st, xl):
            return self._pmean_moments(
                _backward_init_streamed_jit(arr, st, xl, **statics)
            )
        return self._map(
            fn, (self.P(), self.stream_spec, self.state_spec), self.carry_spec
        )(arrays, stream, x_last)

    def bwd_seg_streamed(self, stream, carry, entry, seg, is_first, **statics):
        def fn(st, c, e, sg, fi):
            c2, out = _backward_segment_chunk_jit(st, c, e, sg, fi, **statics)
            return self._pmean_moments(c2), out
        return self._map(
            fn,
            (self.stream_spec, self.carry_spec, self.state_spec, self.P(), self.P()),
            (self.carry_spec, self.P()),
        )(stream, carry, entry, seg, is_first)

    def fwd_seg_streamed(self, stream, carry, seg, **statics):
        fwd_carry_spec = (self.row_spec, self.row_spec, self.state_spec)
        fn = lambda st, c, sg: _forward_segment_chunk_jit(st, c, sg, **statics)
        return self._map(
            fn, (self.stream_spec, fwd_carry_spec, self.P()),
            (fwd_carry_spec, self.P()),
        )(stream, carry, seg)

    # ---- materialised driver ---------------------------------------------
    def _mat_seg_spec(self, seg):
        P, ax = self.P, _MESH_AXIS
        return {
            k: (
                P(None, ax) if k in ("spot", "spot_prev")
                else P(None, None, ax) if k in ("factors", "factors_prev")
                else P()
            )
            for k in seg
        }

    def init_mat(self, arrays, spot_last, factors_last, spot_end, **statics):
        def fn(arr, sl, fl, se):
            return self._pmean_moments(
                _backward_init_mat_jit(arr, sl, fl, se, **statics)
            )
        return self._map(
            fn,
            (self.P(), self.row_spec, self.state_spec, self.row_spec),
            self.carry_spec,
        )(arrays, spot_last, factors_last, spot_end)

    def bwd_seg_mat(self, carry, seg, **statics):
        def fn(c, sg):
            c2, out = _backward_segment_chunk_mat_jit(c, sg, **statics)
            return self._pmean_moments(c2), out
        return self._map(
            fn, (self.carry_spec, self._mat_seg_spec(seg)),
            (self.carry_spec, self.P()),
        )(carry, seg)

    def fwd_seg_mat(self, carry, seg, **statics):
        P, ax = self.P, _MESH_AXIS
        fwd_carry_spec = (self.row_spec, self.row_spec)
        fn = lambda c, sg: _forward_segment_chunk_mat_jit(c, sg, **statics)
        # Per-sim panel outputs (the optional "sim" subtree) keep their path
        # shard; every reduced output is replicated.  The output STRUCTURE is
        # axis-independent, so eval_shape runs with the collectives disabled
        # (tracing a psum outside shard_map would fail on the unbound axis).
        out_spec = getattr(self, "_fwd_mat_out_spec", None)
        if out_spec is None:
            shape_statics = dict(statics, axis_name=None)
            out_shape = jax.eval_shape(
                lambda c, sg: _forward_segment_chunk_mat_jit(c, sg, **shape_statics),
                carry, seg,
            )[1]
            out_spec = {
                k: (P(None, ax) if k == "sim" else P()) for k in out_shape
            }
            self._fwd_mat_out_spec = out_spec
        return self._map(
            fn, (fwd_carry_spec, self._mat_seg_spec(seg)),
            (fwd_carry_spec, out_spec),
        )(carry, seg)


def _resolve_chunked_mesh(mesh, num_sims: int):
    """A usable per-segment mesh: multi-device, paths divide the mesh, and
    single-process (the chunked drivers dispatch from one host)."""
    if (
        mesh is None
        or mesh.devices.size <= 1
        or num_sims % mesh.devices.size != 0
        or jax.process_count() > 1
    ):
        return None
    return mesh


def lsmc_core_streamed_chunked(
    arrays: tp.Dict[str, jnp.ndarray],
    sim_inputs: tp.Dict[str, jnp.ndarray],
    reg_key: jax.Array,
    val_key: jax.Array,
    path_ids: jnp.ndarray,
    starting_inventory,
    monomials: tp.Tuple[Monomial, ...],
    num_extra_decisions: int,
    discount_deltas: bool,
    terminal_fn,
    ratchet_is_step: bool,
    use_pallas: bool = False,
    snap_interp: tp.Optional[bool] = None,
    pred_passes: int = 2,
    seg_len: int = 16,
    antithetic: bool = False,
    same_sims: bool = False,
    return_regression: bool = False,
    segment_cb: tp.Optional[tp.Callable[[str, int, int], None]] = None,
    mesh=None,
) -> tp.Dict[str, jnp.ndarray]:
    """``lsmc_core_streamed`` with host-driven segments: identical numbers
    (same RNG stream, same segment regeneration, same bodies — pinned by
    tests/test_progress_cancellation.py), plus ``segment_cb(phase, done,
    total)`` fired after every ``seg_len``-step segment of the backward and
    forward passes.  Raising from the callback aborts the valuation between
    segments (cooperative cancellation with ≤ seg_len steps of latency).
    Single-process; with a multi-device ``mesh`` every segment runs
    shard_map'd over the local path mesh (interactivity no longer costs a
    multi-chip host its sharding — see _ChunkedMeshCalls)."""
    use_pallas = use_pallas and not has_generic(monomials)  # generic basis -> XLA path
    grids = arrays["grids"]
    n = grids.shape[0] - 1
    seg_len = max(1, min(seg_len, n))
    m, r = n // seg_len, n % seg_len
    total = m + (1 if r else 0)
    dtype = grids.dtype
    s_local = path_ids.shape[0]
    mesh = _resolve_chunked_mesh(mesh, s_local)
    # Kernel eligibility must be decided on the PER-SHARD path count: inside
    # the per-segment shard_map each device sees s_local / n_dev sims, and a
    # global count that tiles while the shard does not would reach the
    # kernels with tile 0 (grid division by zero at trace time).
    s_shard = s_local // mesh.devices.size if mesh is not None else s_local
    use_pallas = use_pallas and decision_kernel.pick_sim_tile(s_shard) > 0
    if snap_interp is None:
        snap_interp = use_pallas
    fused = use_pallas and sim_inputs["decay"].shape[1] > 0
    mcalls = _ChunkedMeshCalls(mesh, fused) if mesh is not None else None
    eff_axis = _MESH_AXIS if mcalls is not None else None

    reg_stream = StreamedSims(
        decay=sim_inputs["decay"], chol=sim_inputs["chol"],
        vols=sim_inputs["vols"], half_var=sim_inputs["half_var"],
        fwd=sim_inputs["fwd"], key=reg_key, path_ids=path_ids,
    )
    val_stream = reg_stream._replace(key=reg_key if same_sims else val_key)

    def tick(phase, done):
        if segment_cb is not None:
            segment_cb(phase, done, total)

    # ---- backward, latest segment first.
    init_statics = dict(
        monomials=monomials, terminal_fn=terminal_fn, axis_name=eff_axis,
        fused=fused, antithetic=antithetic,
    )
    if mcalls is not None:
        checkpoints, ragged_entry, x_last = mcalls.warmup(
            reg_stream, seg_len, antithetic
        )
        carry = mcalls.init_streamed(arrays, reg_stream, x_last, **init_statics)
    else:
        checkpoints, ragged_entry, x_last = _stream_warmup_jit(
            reg_stream, seg_len, antithetic
        )
        carry = _backward_init_streamed_jit(
            arrays, reg_stream, x_last, **init_statics
        )
    per_step = _backward_per_step(arrays)
    per_step.update(_backward_prep_all(
        per_step, num_extra_decisions, ratchet_is_step, snap_interp,
        with_w_mat=use_pallas,
    ))
    per_step.update(_stream_step_arrays(reg_stream, n))
    statics = dict(
        monomials=monomials, num_extra_decisions=num_extra_decisions,
        ratchet_is_step=ratchet_is_step, axis_name=eff_axis, use_pallas=use_pallas,
        snap_interp=snap_interp, pred_passes=pred_passes, antithetic=antithetic,
        fused=fused,
    )
    bwd_call = (
        mcalls.bwd_seg_streamed if mcalls is not None
        else _backward_segment_chunk_jit
    )
    reg_chunks: tp.List[tp.Any] = [None] * total
    done = 0
    if r > 0:
        seg = jax.tree.map(lambda a: a[m * seg_len :], per_step)
        carry, reg_chunks[total - 1] = bwd_call(
            reg_stream, carry, ragged_entry, seg, jnp.asarray(m == 0), **statics
        )
        done += 1
        tick("backward", done)
    for i in reversed(range(m)):
        seg = jax.tree.map(lambda a: a[i * seg_len : (i + 1) * seg_len], per_step)
        carry, reg_chunks[i] = bwd_call(
            reg_stream, carry, checkpoints[i], seg, jnp.asarray(i == 0), **statics
        )
        done += 1
        tick("backward", done)
    regression = jax.tree.map(
        lambda *chunks: jnp.concatenate(chunks, axis=0), *reg_chunks
    )
    v0 = carry[0] if fused else carry

    # ---- forward, segments in time order.
    fwd_fused = _resolve_forward_fused(
        use_pallas, False, dtype, forward_kernel.pick_fwd_sim_tile(s_shard)
    )
    fper = _forward_per_step(arrays, regression, fwd_fused)
    fper.update(_stream_step_arrays(val_stream, n))
    fstatics = dict(
        monomials=monomials, num_extra_decisions=num_extra_decisions,
        discount_deltas=discount_deltas, ratchet_is_step=ratchet_is_step,
        axis_name=eff_axis, antithetic=antithetic, fused=fwd_fused,
        fwd_pred_passes=pred_passes,
    )
    fwd_call = (
        mcalls.fwd_seg_streamed if mcalls is not None
        else _forward_segment_chunk_jit
    )
    inv0 = jnp.full((s_local,), jnp.asarray(starting_inventory, dtype))
    fcarry = (inv0, jnp.zeros((s_local,), dtype),
              jnp.zeros((sim_inputs["decay"].shape[1], s_local), dtype))
    out_chunks = []
    done = 0
    for i in range(m):
        seg = jax.tree.map(lambda a: a[i * seg_len : (i + 1) * seg_len], fper)
        fcarry, outs = fwd_call(val_stream, fcarry, seg, **fstatics)
        out_chunks.append(outs)
        done += 1
        tick("forward", done)
    if r > 0:
        seg = jax.tree.map(lambda a: a[m * seg_len :], fper)
        fcarry, outs = fwd_call(val_stream, fcarry, seg, **fstatics)
        out_chunks.append(outs)
        done += 1
        tick("forward", done)
    outputs = jax.tree.map(
        lambda *chunks: jnp.concatenate(chunks, axis=0), *out_chunks
    )
    final_inventory, pv_by_sim, x_last_f = fcarry
    _, spot_end = _stream_terminal_state(val_stream, x_last_f, n, antithetic)
    result = _forward_finalise(
        outputs, final_inventory, pv_by_sim, spot_end, terminal_fn,
        None, False, s_local, dtype,
    )
    result["backward_npv"] = _global_mean_over_sims(v0[0], None)
    if return_regression:
        result["regression_mean"] = regression["mean"]
        result["regression_std"] = regression["std"]
        result["regression_coeffs"] = regression["coeffs"]
    return result


# ------------------------------ host-chunked execution, materialised panels
#
# VERDICT r03 item 4: the segment drivers above only covered streamed
# (internally simulated) runs, so a ``value_from_sims`` call — or any
# materialised valuation — with a progress callback got ~5 phase-boundary
# polls and was uncancellable mid-pass (the reference polls every period on
# every path, LsmcStorageValuation.cs:343-345,521).  These wrappers run the
# SAME scan bodies over host-sliced panel segments: results are identical to
# ``lsmc_core`` (same per-step arithmetic; scan partitioning does not change
# it — pinned by tests/test_progress_cancellation.py).


@partial(
    jax.jit,
    static_argnames=("monomials", "terminal_fn", "axis_name", "fused"),
)
def _backward_init_mat_jit(
    arrays, spot_last, factors_last, spot_end,
    *, monomials, terminal_fn, axis_name, fused,
):
    grids = arrays["grids"]
    n = grids.shape[0] - 1
    dtype = grids.dtype
    v_end = _terminal_values(
        terminal_fn, spot_end, grids[n], grids.shape[1], spot_end.shape[0], dtype
    )
    if not fused:
        return v_end
    xtx0, xty0, mean0, std0 = _fused_bootstrap(
        monomials, spot_last, factors_last, v_end, axis_name, dtype
    )
    return (v_end, xtx0, xty0, mean0, std0)


@partial(jax.jit, static_argnames=_BWD_SEG_STATICS)
def _backward_segment_chunk_mat_jit(
    carry, seg,
    *, monomials, num_extra_decisions, ratchet_is_step, axis_name, use_pallas,
    snap_interp, pred_passes, antithetic, fused,
):
    del antithetic  # materialised panels carry no RNG identity
    fused_body, plain_body = _backward_bodies(
        monomials, num_extra_decisions, ratchet_is_step, axis_name, use_pallas,
        snap_interp, pred_passes,
    )
    return jax.lax.scan(
        fused_body if fused else plain_body, carry, seg, reverse=True
    )


@partial(
    jax.jit,
    static_argnames=_FWD_SEG_STATICS + ("return_sim_data", "uniform_grids"),
)
def _forward_segment_chunk_mat_jit(
    carry, seg,
    *, monomials, num_extra_decisions, discount_deltas, ratchet_is_step,
    axis_name, antithetic, fused, return_sim_data, uniform_grids=True,
    fwd_pred_passes=2,
):
    del antithetic
    s_local = carry[0].shape[0]
    dtype = carry[0].dtype
    sim_tile = forward_kernel.pick_fwd_sim_tile(s_local)
    fused_body, plain_body = _forward_bodies(
        monomials, num_extra_decisions, discount_deltas, ratchet_is_step,
        axis_name, return_sim_data, s_local, sim_tile, dtype,
        uniform_grids=uniform_grids, fwd_pred_passes=fwd_pred_passes,
    )
    return jax.lax.scan(fused_body if fused else plain_body, carry, seg)


def lsmc_core_chunked(
    arrays: tp.Dict[str, jnp.ndarray],
    spot_reg: jnp.ndarray,    # [N+1, S]
    factors_reg: jnp.ndarray, # [N+1, F, S]
    spot_val: jnp.ndarray,
    factors_val: jnp.ndarray,
    starting_inventory,
    monomials: tp.Tuple[Monomial, ...],
    num_extra_decisions: int,
    discount_deltas: bool,
    terminal_fn,
    ratchet_is_step: bool,
    use_pallas: bool = False,
    snap_interp: tp.Optional[bool] = None,
    pred_passes: int = 2,
    seg_len: int = 16,
    return_sim_data: bool = False,
    return_regression: bool = False,
    segment_cb: tp.Optional[tp.Callable[[str, int, int], None]] = None,
    uniform_grids: bool = True,
    mesh=None,
) -> tp.Dict[str, jnp.ndarray]:
    """``lsmc_core`` with host-driven segments over materialised panels
    (internally simulated with per-sim data requested, or user-supplied sims
    via ``value_from_sims``): ``segment_cb(phase, done, total)`` fires after
    every ``seg_len``-step segment of both passes, and raising from the
    callback aborts between segments.  Single-process; with a multi-device
    ``mesh`` every segment runs shard_map'd over the local path mesh (see
    _ChunkedMeshCalls)."""
    use_pallas = use_pallas and not has_generic(monomials)  # generic basis -> XLA path
    if not uniform_grids:
        use_pallas = False  # general-interp XLA path (see lsmc_core)
    grids = arrays["grids"]
    n = grids.shape[0] - 1
    seg_len = max(1, min(seg_len, n))
    m, r = n // seg_len, n % seg_len
    total = m + (1 if r else 0)
    dtype = grids.dtype
    s_local = spot_reg.shape[1]
    mesh = _resolve_chunked_mesh(mesh, s_local)
    # Per-shard kernel eligibility — see lsmc_core_streamed_chunked.
    s_shard = s_local // mesh.devices.size if mesh is not None else s_local
    use_pallas = use_pallas and decision_kernel.pick_sim_tile(s_shard) > 0
    if snap_interp is None:
        snap_interp = use_pallas
    fused = use_pallas and factors_reg.shape[1] > 0
    mcalls = _ChunkedMeshCalls(mesh, fused) if mesh is not None else None
    eff_axis = _MESH_AXIS if mcalls is not None else None

    def tick(phase, done):
        if segment_cb is not None:
            segment_cb(phase, done, total)

    statics = dict(
        monomials=monomials, num_extra_decisions=num_extra_decisions,
        ratchet_is_step=ratchet_is_step, axis_name=eff_axis, use_pallas=use_pallas,
        snap_interp=snap_interp, pred_passes=pred_passes, antithetic=False,
        fused=fused,
    )
    init_statics = dict(
        monomials=monomials, terminal_fn=terminal_fn, axis_name=eff_axis,
        fused=fused,
    )
    if mcalls is not None:
        carry = mcalls.init_mat(
            arrays, spot_reg[n - 1], factors_reg[n - 1], spot_reg[n],
            **init_statics,
        )
    else:
        carry = _backward_init_mat_jit(
            arrays, spot_reg[n - 1], factors_reg[n - 1], spot_reg[n],
            **init_statics,
        )
    per_step = _backward_per_step(arrays)
    per_step.update(_backward_prep_all(
        per_step, num_extra_decisions, ratchet_is_step, snap_interp,
        with_w_mat=use_pallas, uniform_grids=uniform_grids,
    ))
    per_step["spot"] = spot_reg[:n]
    per_step["factors"] = factors_reg[:n]

    def bwd_segment(lo, hi):
        seg = jax.tree.map(lambda a: a[lo:hi], per_step)
        if fused:
            # Previous-step slices for the in-kernel moment accumulation
            # (t = 0 clamps to itself, as in lsmc_backward).
            if lo > 0:
                seg["spot_prev"] = spot_reg[lo - 1 : hi - 1]
                seg["factors_prev"] = factors_reg[lo - 1 : hi - 1]
            else:
                seg["spot_prev"] = jnp.concatenate(
                    [spot_reg[0:1], spot_reg[: hi - 1]], axis=0
                )
                seg["factors_prev"] = jnp.concatenate(
                    [factors_reg[0:1], factors_reg[: hi - 1]], axis=0
                )
        return seg

    bwd_call = (
        mcalls.bwd_seg_mat if mcalls is not None
        else _backward_segment_chunk_mat_jit
    )
    reg_chunks: tp.List[tp.Any] = [None] * total
    done = 0
    if r > 0:
        carry, reg_chunks[total - 1] = bwd_call(
            carry, bwd_segment(m * seg_len, n), **statics
        )
        done += 1
        tick("backward", done)
    for i in reversed(range(m)):
        carry, reg_chunks[i] = bwd_call(
            carry, bwd_segment(i * seg_len, (i + 1) * seg_len), **statics
        )
        done += 1
        tick("backward", done)
    regression = jax.tree.map(
        lambda *chunks: jnp.concatenate(chunks, axis=0), *reg_chunks
    )
    v0 = carry[0] if fused else carry

    fwd_fused = _resolve_forward_fused(
        use_pallas, return_sim_data, dtype, forward_kernel.pick_fwd_sim_tile(s_shard)
    )
    fper = _forward_per_step(arrays, regression, fwd_fused)
    fper["spot"] = spot_val[:n]
    fper["factors"] = factors_val[:n]
    fstatics = dict(
        monomials=monomials, num_extra_decisions=num_extra_decisions,
        discount_deltas=discount_deltas, ratchet_is_step=ratchet_is_step,
        axis_name=eff_axis, antithetic=False, fused=fwd_fused,
        return_sim_data=return_sim_data, uniform_grids=uniform_grids,
        fwd_pred_passes=pred_passes,
    )
    fwd_call = (
        mcalls.fwd_seg_mat if mcalls is not None
        else _forward_segment_chunk_mat_jit
    )
    inv0 = jnp.full((s_local,), jnp.asarray(starting_inventory, dtype))
    fcarry = (inv0, jnp.zeros((s_local,), dtype))
    out_chunks = []
    done = 0
    for i in range(m):
        seg = jax.tree.map(lambda a: a[i * seg_len : (i + 1) * seg_len], fper)
        fcarry, outs = fwd_call(fcarry, seg, **fstatics)
        out_chunks.append(outs)
        done += 1
        tick("forward", done)
    if r > 0:
        seg = jax.tree.map(lambda a: a[m * seg_len :], fper)
        fcarry, outs = fwd_call(fcarry, seg, **fstatics)
        out_chunks.append(outs)
        done += 1
        tick("forward", done)
    outputs = jax.tree.map(
        lambda *chunks: jnp.concatenate(chunks, axis=0), *out_chunks
    )
    final_inventory, pv_by_sim = fcarry
    result = _forward_finalise(
        outputs, final_inventory, pv_by_sim, spot_val[n], terminal_fn,
        None, return_sim_data, s_local, dtype,
    )
    result["backward_npv"] = _global_mean_over_sims(v0[0], None)
    if return_regression:
        result["regression_mean"] = regression["mean"]
        result["regression_std"] = regression["std"]
        result["regression_coeffs"] = regression["coeffs"]
    return result
