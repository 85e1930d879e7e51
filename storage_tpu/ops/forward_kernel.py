"""Fused Pallas TPU kernel for the LSMC forward simulation step.

The forward pass (reference ``LsmcStorageValuation.cs:390-593``) evaluates,
per period, the fitted continuation values of every simulation at each
candidate decision's target inventory, picks the optimal decision, and
advances per-sim inventory/PV.  A straight XLA lowering materialises the
fitted values [S, G] (~105 MB at the benchmark config) plus hat-weight
temporaries [S, D, G] in HBM every step, making the pass HBM-bound.

This kernel streams simulations through VMEM tiles and fuses the whole step:

* design matrix from the simulated spot/factors (VPU, monomials unrolled
  statically),
* fitted continuation ``pred [G, St] = coeffs_t @ dm_std`` on the MXU in
  split-precision (3 native-bf16 passes ~ f32, see ``decision_kernel._dot3``),
* ratchet lookup + bang-bang decision set + per-decision linear interpolation
  of ``pred`` in inventory (hat contraction, VPU, f32),
* running argmax over decisions (first-max-wins, matching ``jnp.argmax``),
* per-sim inventory/PV carry update,
* on-chip accumulation of the cross-sim sums the step needs downstream
  (expected profiles, pathwise-delta numerator, mean standardised design row
  for trigger prices), so the only per-step HBM traffic is the simulated
  paths in and the carry out.

Scalars (costs, discount factors, feasible band, grid geometry) ride in SMEM;
ratchet node tables are small static-R loops of SMEM scalars (per-lane table
gathers do not lower on the VPU).
"""
from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decision_kernel import _split_bf16, _dot3, pick_sim_tile

# The forward kernel's VMEM working set is smaller than the backward's
# (no [G, G] hat operators or coefficient panels resident), so wide sim
# tiles fit.  Round 4 measured 147.7 / 156.0 / 170.2 ms at 4096/2048/1024
# with 8192 at noise level; after the round-5 in-place aliasing removed the
# backward's per-step copy, 8192 measures consistently fastest e2e
# (262k: 0.441 vs 0.449 s; 1M streamed: 1.556 vs 1.578 s).
_FWD_TILE_CANDIDATES = (8192, 4096, 2048, 1024, 512, 256, 128)


def pick_fwd_sim_tile(num_sims: int) -> int:
    for t in _FWD_TILE_CANDIDATES:
        if num_sims % t == 0:
            return t
    return 0

# Scalar parameter slots (SMEM vector layout).
_P_DF_SETTLE = 0
_P_DF_FLOW = 1
_P_INJ_COST = 2
_P_WDR_COST = 3
_P_INJ_PCNT = 4
_P_WDR_PCNT = 5
_P_LOSS_PCNT = 6
_P_INV_COST = 7
_P_NEXT_MIN = 8
_P_NEXT_MAX = 9
_P_GRID_LO = 10
_P_GRID_HI = 11
_P_GRID_INVDELTA = 12  # 1/delta, or 0 for a degenerate grid
NUM_PARAMS = 13

# Accumulator slots (lane layout of the [1, 8] sums output).
_A_INV = 0
_A_DEC = 1
_A_CONS = 2
_A_LOSS = 3
_A_IMM = 4
_A_DELTA = 5
NUM_SUMS = 8


def _build_design(monomials, spot, factors):
    """Design-matrix rows (list of [1, St]) from a spot tile and the factors
    tile [F, St] (rows sliced statically, keeping everything 2-D for Mosaic)."""
    rows = []
    cached = {}
    for m in monomials:
        row = jnp.ones_like(spot)
        if m.spot_power:
            p = spot
            for _ in range(m.spot_power - 1):
                p = p * spot
            row = row * p
        for idx, power in m.factor_powers:
            if idx not in cached:
                cached[idx] = factors[idx : idx + 1]
            f = cached[idx]
            p = f
            for _ in range(power - 1):
                p = p * f
            row = row * p
        rows.append(row)
    return rows


def _ratchet_rates_smem(ratchet_inv_ref, ratchet_min_ref, ratchet_max_ref,
                        num_nodes: int, is_step: bool, inv):
    """grid.ratchet_rates with the [R] node tables read as SMEM scalars and
    the per-lane gather replaced by a static select chain."""
    lo = ratchet_inv_ref[0]
    hi = ratchet_inv_ref[num_nodes - 1]
    inv_c = jnp.clip(inv, lo, hi)
    min_rate = jnp.full_like(inv_c, ratchet_min_ref[0])
    max_rate = jnp.full_like(inv_c, ratchet_max_ref[0])
    if is_step:
        for r in range(1, num_nodes):
            sel = inv_c >= ratchet_inv_ref[r]
            min_rate = jnp.where(sel, ratchet_min_ref[r], min_rate)
            max_rate = jnp.where(sel, ratchet_max_ref[r], max_rate)
        return min_rate, max_rate
    if num_nodes > 1:
        # Segment lerp, accumulated segment by segment (static R loop).
        x0 = ratchet_inv_ref[0]
        x1 = ratchet_inv_ref[1]
        span = x1 - x0
        safe = jnp.where(span > 0, span, 1.0)
        w = jnp.clip((inv_c - x0) / safe, 0.0, 1.0)
        min_rate = ratchet_min_ref[0] * (1 - w) + ratchet_min_ref[1] * w
        max_rate = ratchet_max_ref[0] * (1 - w) + ratchet_max_ref[1] * w
        for r in range(1, num_nodes - 1):
            x0 = ratchet_inv_ref[r]
            x1 = ratchet_inv_ref[r + 1]
            span = x1 - x0
            safe = jnp.where(span > 0, span, 1.0)
            w = jnp.clip((inv_c - x0) / safe, 0.0, 1.0)
            seg_min = ratchet_min_ref[r] * (1 - w) + ratchet_min_ref[r + 1] * w
            seg_max = ratchet_max_ref[r] * (1 - w) + ratchet_max_ref[r + 1] * w
            sel = inv_c >= x0
            min_rate = jnp.where(sel, seg_min, min_rate)
            max_rate = jnp.where(sel, seg_max, max_rate)
    return min_rate, max_rate


def _bang_bang(min_rate, max_rate, inventory, loss_pcnt, next_min, next_max,
               num_extra_decisions: int):
    """grid.bang_bang_decisions, returning a static list of [*, St] volumes
    (decision axis unrolled instead of stacked)."""
    inv_after_loss = inventory - loss_pcnt * inventory
    w_target = min_rate + inv_after_loss
    yielded_w = jnp.where(
        w_target > next_max,
        next_max - inv_after_loss,
        jnp.where(w_target > next_min, min_rate, next_min - inv_after_loss),
    )
    i_target = max_rate + inv_after_loss
    yielded_i = jnp.where(
        i_target < next_min,
        next_min - inv_after_loss,
        jnp.where(i_target < next_max, max_rate, next_max - inv_after_loss),
    )
    has_zero = (yielded_w < 0.0) & (yielded_i > 0.0)

    e = num_extra_decisions
    d = 2 * e + 3
    mid = e + 1
    out = []
    for k in range(d):
        frac_lo = k / mid
        frac_hi = (k - mid) / mid
        with_zero = yielded_w * (1.0 - frac_lo) if k <= mid else yielded_i * frac_hi
        frac = max(k - 1.0, 0.0) / (d - 2)
        without_zero = yielded_w + (yielded_i - yielded_w) * frac
        out.append(jnp.where(has_zero, with_zero, without_zero))
    return out


def _forward_kernel(
    params_ref,       # SMEM [NUM_PARAMS]
    mean_ref,         # SMEM [B]
    std_ref,          # SMEM [B]
    ratchet_inv_ref,  # SMEM [R]
    ratchet_min_ref,  # SMEM [R]
    ratchet_max_ref,  # SMEM [R]
    spot_ref,         # VMEM [1, St]
    factors_ref,      # VMEM [F, St]
    inv_ref,          # VMEM [1, St] carry in
    pv_ref,           # VMEM [1, St] carry in
    coeffs_t_ref,     # VMEM [G, B]
    inv_out_ref,      # VMEM [1, St]
    pv_out_ref,       # VMEM [1, St]
    dec_out_ref,      # VMEM [1, St] chosen decision volume
    cons_out_ref,     # VMEM [1, St] chosen fuel consumption
    sums_ref,         # VMEM [1, NUM_SUMS] accumulated across tiles
    xbar_ref,         # VMEM [1, B] accumulated sum of standardised design rows
    *,
    monomials,
    num_extra_decisions: int,
    num_ratchet_nodes: int,
    ratchet_is_step: bool,
    pred_passes: int = 2,
):
    spot = spot_ref[...]            # [1, St]
    inventory = inv_ref[...]
    pv = pv_ref[...]
    f32 = jnp.float32

    # Standardised design matrix rows [B, St].
    rows = _build_design(monomials, spot, factors_ref[...])
    b_dim = len(rows)
    dm_std = [(rows[i] - mean_ref[i]) / std_ref[i] for i in range(b_dim)]
    dm = jnp.concatenate(dm_std, axis=0)  # [B, St]

    # Fitted continuation values at every next-period grid point:
    # pred [G, St] = coeffs_t [G, B] @ dm [B, St], split-precision MXU
    # (3 native-bf16 passes ~ f32).  Reduced-pass variants were MEASURED AND
    # REJECTED (docs/ROOFLINE.md round-4 forward experiments): a
    # full-magnitude 2-pass loses ~100 SE of NPV, and a row-0-CENTRED 2-pass
    # loses ~56 SE — unlike the backward's centred DECISION gaps, grid-wide
    # gaps span the full value range, so bf16 error on them dwarfs the
    # decision differences the argmax must resolve.  pred_passes: >=2 = the
    # validated 3-pass; 1 = f32 VPU outer-product accumulation (exact but
    # slower: the forward kernel is VPU-bound).
    ct = coeffs_t_ref[...]
    if pred_passes >= 2:
        ct_hi, ct_lo = _split_bf16(ct)
        dm_hi, dm_lo = _split_bf16(dm)
        pred = _dot3(ct_hi, ct_lo, dm_hi, dm_lo)  # [G, St]
    else:
        pred = ct[:, 0:1] * dm[0:1]
        for bi in range(1, b_dim):
            pred = pred + ct[:, bi : bi + 1] * dm[bi : bi + 1]
    g = pred.shape[0]

    loss_pcnt = params_ref[_P_LOSS_PCNT]
    next_min = params_ref[_P_NEXT_MIN]
    next_max = params_ref[_P_NEXT_MAX]
    min_rate, max_rate = _ratchet_rates_smem(
        ratchet_inv_ref, ratchet_min_ref, ratchet_max_ref, num_ratchet_nodes,
        ratchet_is_step, inventory,
    )
    decisions = _bang_bang(
        min_rate, max_rate, inventory, loss_pcnt, next_min, next_max,
        num_extra_decisions,
    )  # list of [1, St]

    loss = loss_pcnt * inventory
    grid_lo = params_ref[_P_GRID_LO]
    grid_hi = params_ref[_P_GRID_HI]
    inv_delta = params_ref[_P_GRID_INVDELTA]
    # Mosaic iota is integer-only; cast after.
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0).astype(f32)  # [G, 1]

    df_settle = params_ref[_P_DF_SETTLE]
    df_flow = params_ref[_P_DF_FLOW]
    inv_cost_npv = params_ref[_P_INV_COST] * inventory * df_flow  # [1, St]

    best_total = None
    opt = {}
    for d, dec in enumerate(decisions):
        inv_after = inventory + dec - loss  # [1, St]
        pos = jnp.clip(inv_after, grid_lo, grid_hi) - grid_lo
        pos = pos * inv_delta  # [1, St] fractional grid position (0 if degenerate)
        hat = jnp.clip(1.0 - jnp.abs(pos - g_iota), 0.0, 1.0)  # [G, St]
        cont = jnp.sum(hat * pred, axis=0, keepdims=True)  # [1, St]

        is_inject = dec > 0.0
        abs_d = jnp.abs(dec)
        consumed = jnp.where(
            is_inject, params_ref[_P_INJ_PCNT], params_ref[_P_WDR_PCNT]
        ) * abs_d
        cost_npv = jnp.where(
            is_inject, params_ref[_P_INJ_COST], params_ref[_P_WDR_COST]
        ) * abs_d * df_flow
        imm = -(dec + consumed) * df_settle * spot - cost_npv - inv_cost_npv
        total = imm + cont
        if d == 0:
            best_total = total
            opt = {"dec": dec, "cons": consumed, "imm": imm, "inv": inv_after}
        else:
            better = total > best_total
            best_total = jnp.where(better, total, best_total)
            opt = {
                "dec": jnp.where(better, dec, opt["dec"]),
                "cons": jnp.where(better, consumed, opt["cons"]),
                "imm": jnp.where(better, imm, opt["imm"]),
                "inv": jnp.where(better, inv_after, opt["inv"]),
            }

    inv_out_ref[...] = opt["inv"]
    pv_out_ref[...] = pv + opt["imm"]
    dec_out_ref[...] = opt["dec"]
    cons_out_ref[...] = opt["cons"]

    # Cross-sim partial sums, accumulated over the sequential tile grid.
    # Mosaic cannot concatenate scalar lanes; scatter each scalar into its
    # slot with a one-hot lane mask instead.
    parts = [
        jnp.sum(inventory),
        jnp.sum(opt["dec"]),
        jnp.sum(opt["cons"]),
        jnp.sum(loss),
        jnp.sum(opt["imm"]),
        jnp.sum(-(opt["dec"] + opt["cons"]) * spot),
    ]
    lane_s = jax.lax.broadcasted_iota(jnp.int32, (1, NUM_SUMS), 1)
    sums_part = jnp.zeros((1, NUM_SUMS), f32)
    for i, p in enumerate(parts):
        sums_part = sums_part + jnp.where(lane_s == i, p, 0.0)
    lane_b = jax.lax.broadcasted_iota(jnp.int32, (1, b_dim), 1)
    xbar_part = jnp.zeros((1, b_dim), f32)
    for i in range(b_dim):
        xbar_part = xbar_part + jnp.where(lane_b == i, jnp.sum(dm_std[i]), 0.0)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        sums_ref[...] = jnp.zeros_like(sums_ref)
        xbar_ref[...] = jnp.zeros_like(xbar_ref)

    sums_ref[...] += sums_part
    xbar_ref[...] += xbar_part


@functools.partial(
    jax.jit,
    static_argnames=(
        "monomials", "num_extra_decisions", "ratchet_is_step", "sim_tile",
        "interpret", "pred_passes",
    ),
)
def forward_step_pallas(
    params: jnp.ndarray,       # [NUM_PARAMS] f32
    mean: jnp.ndarray,         # [B]
    std: jnp.ndarray,          # [B]
    ratchet_inv: jnp.ndarray,  # [R]
    ratchet_min: jnp.ndarray,  # [R]
    ratchet_max: jnp.ndarray,  # [R]
    spot: jnp.ndarray,         # [S]
    factors: jnp.ndarray,      # [F, S]
    inventory: jnp.ndarray,    # [S]
    pv: jnp.ndarray,           # [S]
    coeffs: jnp.ndarray,       # [B, G]
    monomials,
    num_extra_decisions: int,
    ratchet_is_step: bool,
    sim_tile: int,
    interpret: bool = False,
    pred_passes: int = 2,
):
    """One fused forward step.  Returns (new_inventory [S], new_pv [S],
    opt_decision [S], opt_consumed [S], sums [NUM_SUMS], xbar_sum [B])."""
    s = spot.shape[0]
    b_dim = coeffs.shape[0]
    g = coeffs.shape[1]
    r = ratchet_inv.shape[0]
    f = factors.shape[0]
    grid = (s // sim_tile,)

    kernel = functools.partial(
        _forward_kernel,
        monomials=tuple(monomials),
        num_extra_decisions=num_extra_decisions,
        num_ratchet_nodes=r,
        ratchet_is_step=ratchet_is_step,
        pred_passes=pred_passes,
    )
    smem = lambda shape: pl.BlockSpec(memory_space=pltpu.SMEM)
    tile = lambda rows: pl.BlockSpec(
        (rows, sim_tile), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    acc = lambda cols: pl.BlockSpec((1, cols), lambda i: (0, 0), memory_space=pltpu.VMEM)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            smem((NUM_PARAMS,)),
            smem((b_dim,)),
            smem((b_dim,)),
            smem((r,)),
            smem((r,)),
            smem((r,)),
            tile(1),
            tile(f),
            tile(1),
            tile(1),
            pl.BlockSpec((g, b_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            tile(1), tile(1), tile(1), tile(1), acc(NUM_SUMS), acc(b_dim),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, s), jnp.float32),
            jax.ShapeDtypeStruct((1, s), jnp.float32),
            jax.ShapeDtypeStruct((1, s), jnp.float32),
            jax.ShapeDtypeStruct((1, s), jnp.float32),
            jax.ShapeDtypeStruct((1, NUM_SUMS), jnp.float32),
            jax.ShapeDtypeStruct((1, b_dim), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * g * s * (b_dim + 2 * (2 * num_extra_decisions + 3)),
            bytes_accessed=4 * s * (f + 5),
            transcendentals=0,
        ),
        interpret=interpret,
    )(
        params, mean, std, ratchet_inv, ratchet_min, ratchet_max,
        spot[None, :], factors, inventory[None, :], pv[None, :],
        jnp.swapaxes(coeffs, 0, 1),
    )
    new_inv, new_pv, opt_dec, opt_cons, sums, xbar = out
    return (
        new_inv[0], new_pv[0], opt_dec[0], opt_cons[0], sums[0], xbar[0],
    )


def pack_params(x: tp.Dict[str, jnp.ndarray], grid_next) -> jnp.ndarray:
    """Pack one step's scalars into the SMEM parameter vector (f32)."""
    g = grid_next.shape[0]
    lo = grid_next[0]
    hi = grid_next[g - 1]
    span = hi - lo
    delta = span / (g - 1)
    inv_delta = jnp.where(delta > 0, (g - 1) / jnp.where(span > 0, span, 1.0), 0.0)
    vals = [
        x["df_settle"], x["df_flow"], x["inj_cost"], x["wdr_cost"],
        x["inj_pcnt"], x["wdr_pcnt"], x["loss_pcnt"], x["inv_cost_rate"],
        x["next_min"], x["next_max"], lo, hi, inv_delta,
    ]
    return jnp.stack([jnp.asarray(v, jnp.float32) for v in vals])
