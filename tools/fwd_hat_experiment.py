"""Round-5 forward-kernel hat experiment (continuation session).

The backward kernel's 2-non-zero gather was a measured dead end
(docs/ROOFLINE.md round 5): its dense alternative is 2 MXU passes whose
K-dim already fits one 128-tile, and the shipped kernel hides the hat under
the DMA/VPU pipeline (2% ablation bound).  The FORWARD kernel is different:
its per-sim hat contraction (`forward_kernel._forward_kernel`, the
``hat = clip(1-|pos-g_iota|); cont = sum(hat*pred)`` loop) has NO MXU form —
it costs ~5·G·D·St VPU ops per tile, i.e. ~1500 VPU ops/sim against the
pred matmul's MXU work, and ROOFLINE calls the forward pass VPU-bound on
exactly this contraction.  A per-sim 2-point gather would cost O(D·St).

This script measures, on hardware, a 50-step forward scan with:

  1. the CURRENT kernel body (dense hat contraction);
  2. the hat ABLATED (``cont = pred[0:1] + pos`` — same pred matmul, same
     HBM traffic, zero interpolation compute): the upper bound on ANY hat
     reformulation;
  3. a transposed lane-gather form: transpose ``pred`` once per tile to
     [St, G], per decision gather the two bracketing columns with
     ``take_along_axis`` (per-SUBLANE indices, lane axis = grid — the
     DynamicGatherOp form verified to lower in tools/hat_experiment.py),
     weighted-add, transpose the [St, 1] result back.

Variant 3's outputs are checked elementwise against variant 1 (the snapped
f32 weights make both forms evaluate p0*(1-w) + p1*w with exact zero terms,
so they should agree bit-for-bit or to f32 ulp).

Run on the TPU with nothing else on the host.
"""
from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

sys.path.insert(0, "/root/repo")
from storage_tpu.basis import Monomial  # noqa: E402
from storage_tpu.ops import forward_kernel as fk  # noqa: E402
from storage_tpu.ops.decision_kernel import _split_bf16, _dot3  # noqa: E402

S, STEPS, G, B, F, TILE = 262144, 50, 100, 9, 3, 8192

MONOMIALS = tuple(
    [Monomial(0, ()), Monomial(1, ()), Monomial(2, ())]
    + [Monomial(0, ((i, 1),)) for i in range(F)]
    + [Monomial(0, ((i, 2),)) for i in range(F)]
)


def _force(x):
    jax.block_until_ready(x)
    return float(jnp.ravel(x)[0])


def timeit(fn, *args, n=5):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    _force(out[0])
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn_j(*args)
        _force(out[0])
        best = min(best, time.perf_counter() - t0)
    return best, out


def _variant_kernel(
    params_ref, mean_ref, std_ref, r_inv_ref, r_min_ref, r_max_ref,
    spot_ref, factors_ref, inv_ref, pv_ref, coeffs_t_ref,
    inv_out_ref, pv_out_ref,
    *, hat_mode: str,
):
    """The shipped forward step body (carry outputs only) with the hat
    contraction swapped per ``hat_mode``."""
    f32 = jnp.float32
    spot = spot_ref[...]
    inventory = inv_ref[...]
    pv = pv_ref[...]

    rows = fk._build_design(MONOMIALS, spot, factors_ref[...])
    b_dim = len(rows)
    dm_std = [(rows[i] - mean_ref[i]) / std_ref[i] for i in range(b_dim)]
    dm = jnp.concatenate(dm_std, axis=0)

    ct = coeffs_t_ref[...]
    ct_hi, ct_lo = _split_bf16(ct)
    dm_hi, dm_lo = _split_bf16(dm)
    pred = _dot3(ct_hi, ct_lo, dm_hi, dm_lo)  # [G, St]
    g = pred.shape[0]
    if hat_mode == "gather":
        pred_t = jnp.swapaxes(pred, 0, 1)  # [St, G]

    loss_pcnt = params_ref[fk._P_LOSS_PCNT]
    next_min = params_ref[fk._P_NEXT_MIN]
    next_max = params_ref[fk._P_NEXT_MAX]
    min_rate, max_rate = fk._ratchet_rates_smem(
        r_inv_ref, r_min_ref, r_max_ref, 2, False, inventory
    )
    decisions = fk._bang_bang(
        min_rate, max_rate, inventory, loss_pcnt, next_min, next_max, 0
    )

    loss = loss_pcnt * inventory
    grid_lo = params_ref[fk._P_GRID_LO]
    grid_hi = params_ref[fk._P_GRID_HI]
    inv_delta = params_ref[fk._P_GRID_INVDELTA]
    g_iota = jax.lax.broadcasted_iota(jnp.int32, (g, 1), 0).astype(f32)

    df_settle = params_ref[fk._P_DF_SETTLE]
    df_flow = params_ref[fk._P_DF_FLOW]
    inv_cost_npv = params_ref[fk._P_INV_COST] * inventory * df_flow

    best_total = None
    opt = {}
    for d, dec in enumerate(decisions):
        inv_after = inventory + dec - loss
        pos = jnp.clip(inv_after, grid_lo, grid_hi) - grid_lo
        pos = pos * inv_delta  # [1, St]
        if hat_mode == "dense":
            hat = jnp.clip(1.0 - jnp.abs(pos - g_iota), 0.0, 1.0)
            cont = jnp.sum(hat * pred, axis=0, keepdims=True)
        elif hat_mode == "ablate":
            cont = pred[0:1] + pos
        elif hat_mode == "gather":
            pos_t = jnp.swapaxes(pos, 0, 1)  # [St, 1]
            idx_f = jnp.clip(jnp.floor(pos_t), 0.0, float(g - 2))
            w = pos_t - idx_f
            idx = idx_f.astype(jnp.int32)
            # A [St, 1] index gather does NOT lower (Mosaic assertion); the
            # only lowerable form broadcasts the index over the full lane
            # width and gathers all G lanes per sublane (then slices) — the
            # same full-tile DynamicGatherOp cost tools/hat_experiment.py
            # measured as slower than dense compute in the backward case.
            idx_b = jnp.broadcast_to(idx, pred_t.shape)
            p0 = jnp.take_along_axis(pred_t, idx_b, axis=1)[:, 0:1]
            p1 = jnp.take_along_axis(pred_t, idx_b + 1, axis=1)[:, 0:1]
            cont_t = p0 * (1.0 - w) + p1 * w
            cont = jnp.swapaxes(cont_t, 0, 1)
        else:
            raise ValueError(hat_mode)

        is_inject = dec > 0.0
        abs_d = jnp.abs(dec)
        consumed = jnp.where(
            is_inject, params_ref[fk._P_INJ_PCNT], params_ref[fk._P_WDR_PCNT]
        ) * abs_d
        cost_npv = jnp.where(
            is_inject, params_ref[fk._P_INJ_COST], params_ref[fk._P_WDR_COST]
        ) * abs_d * df_flow
        imm = -(dec + consumed) * df_settle * spot - cost_npv - inv_cost_npv
        total = imm + cont
        if d == 0:
            best_total = total
            opt = {"imm": imm, "inv": inv_after}
        else:
            better = total > best_total
            best_total = jnp.where(better, total, best_total)
            opt = {
                "imm": jnp.where(better, imm, opt["imm"]),
                "inv": jnp.where(better, inv_after, opt["inv"]),
            }

    inv_out_ref[...] = opt["inv"]
    pv_out_ref[...] = pv + opt["imm"]


def fwd_call(hat_mode, params, mean, std, r_inv, r_min, r_max,
             spot, factors, inventory, pv, coeffs_t):
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    tile = lambda rows: pl.BlockSpec(
        (rows, TILE), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(_variant_kernel, hat_mode=hat_mode),
        grid=(S // TILE,),
        in_specs=[
            smem, smem, smem, smem, smem, smem,
            tile(1), tile(F), tile(1), tile(1),
            pl.BlockSpec((G, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[tile(1), tile(1)],
        out_shape=[
            jax.ShapeDtypeStruct((1, S), jnp.float32),
            jax.ShapeDtypeStruct((1, S), jnp.float32),
        ],
    )(params, mean, std, r_inv, r_min, r_max,
      spot[None, :], factors, inventory, pv, coeffs_t)


def make_inputs(key):
    ks = jax.random.split(key, 6)
    spot = jax.random.normal(ks[0], (S,), jnp.float32) * 5.0 + 20.0
    factors = jax.random.normal(ks[1], (F, S), jnp.float32)
    coeffs_t = jax.random.normal(ks[2], (G, B), jnp.float32) * 3.0
    inv0 = jax.random.uniform(ks[3], (1, S), jnp.float32) * 50000.0
    pv0 = jnp.zeros((1, S), jnp.float32)
    mean = jnp.zeros((B,), jnp.float32).at[1:].set(
        jax.random.normal(ks[4], (B - 1,), jnp.float32)
    )
    std = jnp.abs(jax.random.normal(ks[5], (B,), jnp.float32)) + 0.5
    params = jnp.zeros((fk.NUM_PARAMS,), jnp.float32)
    params = params.at[fk._P_DF_SETTLE].set(0.99)
    params = params.at[fk._P_DF_FLOW].set(0.995)
    params = params.at[fk._P_INJ_COST].set(0.01)
    params = params.at[fk._P_WDR_COST].set(0.02)
    params = params.at[fk._P_INJ_PCNT].set(0.01)
    params = params.at[fk._P_WDR_PCNT].set(0.01)
    params = params.at[fk._P_NEXT_MIN].set(0.0)
    params = params.at[fk._P_NEXT_MAX].set(100000.0)
    params = params.at[fk._P_GRID_LO].set(0.0)
    params = params.at[fk._P_GRID_HI].set(100000.0)
    params = params.at[fk._P_GRID_INVDELTA].set((G - 1) / 100000.0)
    r_inv = jnp.asarray([0.0, 100000.0], jnp.float32)
    r_min = jnp.asarray([-3000.0, -3000.0], jnp.float32)
    r_max = jnp.asarray([2500.0, 2500.0], jnp.float32)
    return params, mean, std, r_inv, r_min, r_max, spot, factors, inv0, pv0, coeffs_t


def scan_fn(hat_mode):
    def run(params, mean, std, r_inv, r_min, r_max, spot, factors, inv0, pv0, ct):
        def body(carry, _):
            inv, pv = carry
            new_inv, new_pv = fwd_call(
                hat_mode, params, mean, std, r_inv, r_min, r_max,
                spot[0], factors, inv, pv, ct,
            )
            return (new_inv, new_pv), ()
        (inv, pv), _ = jax.lax.scan(body, (inv0, pv0), None, length=STEPS)
        return inv, pv
    return run


def main():
    print(f"jax {jax.__version__} backend={jax.default_backend()}")
    inputs = make_inputs(jax.random.key(7))
    args = inputs[:6] + (inputs[6][None, :],) + inputs[7:]

    # Interleaved A/B: the tunnel drifts ~5-10% between back-to-back
    # measurements, so dense/ablate are alternated and each takes its best.
    jitted, results = {}, {}
    for mode in ("dense", "ablate", "gather"):
        try:
            fn = jax.jit(scan_fn(mode))
            out = fn(*args)
            _force(out[0])
            jitted[mode] = fn
            results[mode] = (np.inf, out)
        except Exception as e:  # compile failure is a result here
            print(f"{mode:>7}: FAILED — {type(e).__name__}: {str(e)[:300]}")
    for _ in range(8):
        for mode, fn in jitted.items():
            t0 = time.perf_counter()
            out = fn(*args)
            _force(out[0])
            dt = time.perf_counter() - t0
            best, _ = results[mode]
            results[mode] = (min(best, dt), out)
    for mode, (t, _) in results.items():
        print(f"{mode:>7}: {t*1e3:8.2f} ms / {STEPS} steps ({t/STEPS*1e6:7.1f} us/step)")

    if "dense" in results and "gather" in results:
        (_, (inv_d, pv_d)), (_, (inv_g, pv_g)) = results["dense"], results["gather"]
        same_inv = bool(jnp.array_equal(inv_d, inv_g))
        max_pv = float(jnp.max(jnp.abs(pv_d - pv_g)))
        rel = max_pv / max(1e-30, float(jnp.max(jnp.abs(pv_d))))
        print(f"gather vs dense: inv bit-equal={same_inv} max|dpv|={max_pv:.3e} (rel {rel:.2e})")
    if "dense" in results and "ablate" in results:
        td, ta = results["dense"][0], results["ablate"][0]
        print(f"hat ablation bound: {(td-ta)/td*100:.1f}% of the {STEPS}-step scan")


if __name__ == "__main__":
    main()
