"""Round-5 hat-interpolation experiment (VERDICT r04 item 1).

The backward decision kernel spends ~96 of its ~104 MXU tile-matmuls per
(step, tile) on ``W[d] @ v`` where each row of ``W`` has exactly 2 non-zeros
(linear interpolation between adjacent inventory grid points,
``LsmcStorageValuation.cs:807-826``).  This script measures, on hardware:

  1. the CURRENT kernel (one-hot hat on the MXU, 2-pass snapped-bf16);
  2. the same kernel with the hat ABLATED (``va = v + imm``) — the upper
     bound on ANY hat reformulation (same HBM traffic, zero hat compute);
  3. whether Mosaic can lower the gather forms at all:
     a. unaligned dynamic sublane slice  (expected: compile error);
     b. lane-axis dynamic gather on a transposed [S, G] tile (take_along_axis);
  4. if (3b) compiles: hat-only microbenchmarks — MXU one-hot vs transposed
     lane-gather+FMA (the rewritten-kernel bound, no transposes).

Run on the TPU with nothing else on the host.  Timings via repeated jit calls
with a single-element force (see memory: tpu-tunnel-benchmarking).
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
from storage_tpu.ops import decision_kernel as dk  # noqa: E402

G, D, B, S, STEPS = 100, 3, 9, 262144, 50
TILE = 2048


def _force(x):
    jax.block_until_ready(x)
    return float(jnp.ravel(x)[0])


def timeit(fn, *args, n=5):
    fn_j = jax.jit(fn)
    out = fn_j(*args)
    _force(out)  # compile
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn_j(*args)
        _force(out)
        best = min(best, time.perf_counter() - t0)
    return best


def make_inputs(key):
    ks = jax.random.split(key, 8)
    v = jax.random.normal(ks[0], (G, S), jnp.float32) * 10.0 + 100.0
    dm = jax.random.normal(ks[1], (B, S), jnp.float32)
    spot = jax.random.normal(ks[2], (S,), jnp.float32) * 5.0 + 20.0
    idx_np = np.sort(np.random.default_rng(0).integers(0, G - 1, size=(G, D)), axis=0)
    idx = jnp.asarray(idx_np.astype(np.int32))  # [G, D]
    w_hi = dk.snap_weights(jnp.asarray(np.random.default_rng(1).random((G, D)), jnp.float32))
    w_mat = dk.interp_weight_matrix(idx, w_hi, G, jnp.float32)  # [D, G, G]
    ci = jax.random.normal(ks[3], (D, G, B), jnp.float32)
    a = jax.random.normal(ks[4], (D, G), jnp.float32)
    b = jax.random.normal(ks[5], (D, G), jnp.float32)
    return v, dm, spot, idx, w_hi, w_mat, ci, a, b


# ---- variant 2: hat ablated (same traffic, no interpolation compute) ------

def _kernel_ablate(v_ref, dm_ref, spot_ref, w_ref, dci_ref, a_ref, b_ref,
                   out_ref, *, num_decisions: int, pred_passes: int):
    f32 = jnp.float32
    v = v_ref[...]
    dm = dm_ref[...]
    spot = spot_ref[...]
    dm_hi, dm_lo = dk._split_bf16(dm)
    imm0 = a_ref[0] * spot + b_ref[0]
    best_reg = imm0
    best_act = v + imm0          # ABLATED: no interpolation
    for d in range(1, num_decisions):
        dci_hi, _ = dk._split_bf16(dci_ref[d])
        q = (
            jnp.dot(dci_hi, dm_hi, preferred_element_type=f32)
            + jnp.dot(dci_hi, dm_lo, preferred_element_type=f32)
        )
        imm = a_ref[d] * spot + b_ref[d]
        vr = q + imm
        va = v + imm             # ABLATED
        better = vr > best_reg
        best_reg = jnp.where(better, vr, best_reg)
        best_act = jnp.where(better, va, best_act)
    out_ref[...] = best_act


def ablate_call(v, dm_std_t, spot, w, ci, a, b):
    g, s = v.shape
    b_dim = dm_std_t.shape[0]
    d = w.shape[0]
    w_bf = dk.snap_weights(w).astype(jnp.bfloat16)
    dci = ci - ci[0:1]
    return pl.pallas_call(
        functools.partial(_kernel_ablate, num_decisions=d, pred_passes=2),
        out_shape=jax.ShapeDtypeStruct((g, s), v.dtype),
        grid=(s // TILE,),
        in_specs=[
            pl.BlockSpec((g, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((b_dim, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, g, g), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, g, b_dim), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, g, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, g, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((g, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
    )(v, dm_std_t, spot[None, :], w_bf, dci, a[..., None], b[..., None])


# ---- variant 3b/4: lane-axis dynamic gather on transposed tiles -----------

def _kernel_lane_gather(idxp_ref, w_ref, vt_ref, out_ref, *, num_decisions: int):
    # vt [St, G]: gather along lanes (axis -1) with per-lane indices that are
    # uniform across sublanes — the DynamicGatherOp form.  out[d] [St, G].
    vt = vt_ref[...]
    for d in range(num_decisions):
        idx_row = idxp_ref[d]          # [1, G] int32 in VMEM
        idx = jnp.broadcast_to(idx_row, vt.shape)
        v_lo = jnp.take_along_axis(vt, idx, axis=1)
        v_hi = jnp.take_along_axis(vt, idx + 1, axis=1)
        w = w_ref[d]                   # [1, G]
        out_ref[d] = v_lo * (1.0 - w) + v_hi * w


def lane_gather_call(vt, idx, w_hi):
    # vt [S, G], idx [G, D] -> pass as [D, 1, G]
    s, g = vt.shape
    d = idx.shape[1]
    idxp = idx.T[:, None, :]  # [D, 1, G]
    wp = w_hi.T[:, None, :]
    return pl.pallas_call(
        functools.partial(_kernel_lane_gather, num_decisions=d),
        out_shape=jax.ShapeDtypeStruct((d, s, g), vt.dtype),
        grid=(s // TILE,),
        in_specs=[
            pl.BlockSpec((d, 1, g), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((d, 1, g), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, g), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, TILE, g), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
    )(idxp, wp, vt)


def _kernel_hat_mxu(w_ref, v_ref, out_ref, *, num_decisions: int):
    # Hat ONLY (current form): 2-pass snapped-bf16 one-hot matmul.
    f32 = jnp.float32
    v_hi, v_lo = dk._split_bf16(v_ref[...])
    for d in range(num_decisions):
        w_bf = w_ref[d]
        out_ref[d] = (
            jnp.dot(w_bf, v_hi, preferred_element_type=f32)
            + jnp.dot(w_bf, v_lo, preferred_element_type=f32)
        )


def hat_mxu_call(v, w_mat):
    g, s = v.shape
    d = w_mat.shape[0]
    w_bf = w_mat.astype(jnp.bfloat16)
    return pl.pallas_call(
        functools.partial(_kernel_hat_mxu, num_decisions=d),
        out_shape=jax.ShapeDtypeStruct((d, g, s), v.dtype),
        grid=(s // TILE,),
        in_specs=[
            pl.BlockSpec((d, g, g), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((g, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((d, g, TILE), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
    )(w_bf, v)


def main():
    print(f"jax {jax.__version__} backend={jax.default_backend()}")
    key = jax.random.key(42)
    v, dm, spot, idx, w_hi, w_mat, ci, a, b = make_inputs(key)

    # 1. current kernel, STEPS sequential calls (carry v like the real scan)
    def current_scan(v0, dm, spot, w_mat, ci, a, b):
        def body(carry, _):
            out = dk.decision_update_pallas(
                carry, dm, spot, w_mat, ci, a, b, sim_tile=TILE, pred_passes=2
            )
            return out, ()
        return jax.lax.scan(body, v0, None, length=STEPS)[0]

    t = timeit(current_scan, v, dm, spot, w_mat, ci, a, b)
    print(f"1. current kernel      : {t*1e3:8.2f} ms / {STEPS} steps  ({t/STEPS*1e6:7.1f} us/step)")

    # 2. hat ablated
    def ablate_scan(v0, dm, spot, w_mat, ci, a, b):
        def body(carry, _):
            out = ablate_call(carry, dm, spot, w_mat, ci, a, b)
            return out, ()
        return jax.lax.scan(body, v0, None, length=STEPS)[0]

    t2 = timeit(ablate_scan, v, dm, spot, w_mat, ci, a, b)
    print(f"2. hat ABLATED (bound) : {t2*1e3:8.2f} ms / {STEPS} steps  ({t2/STEPS*1e6:7.1f} us/step)")
    print(f"   -> hat share of kernel step: {100*(1-t2/t):.1f}%")

    # 3b. lane-gather compile test + hat-only microbench
    vt = v.T.copy()  # [S, G]
    try:
        def gather_scan(vt, idx, w_hi):
            def body(carry, _):
                out = lane_gather_call(carry, idx, w_hi)
                return out[0], ()  # d=0 slice feeds the next step: no DCE
            return jax.lax.scan(body, vt, None, length=STEPS)[0]
        t3 = timeit(gather_scan, vt, idx, w_hi)
        print(f"3. lane-gather hat-only: {t3*1e3:8.2f} ms / {STEPS} steps  ({t3/STEPS*1e6:7.1f} us/step)")
        # correctness vs one-hot
        got = lane_gather_call(vt, idx, w_hi)          # [D, S, G]
        want = jnp.einsum("dgh,hs->dgs", w_mat, v)     # [D, G, S]
        err = jnp.max(jnp.abs(jnp.transpose(got, (0, 2, 1)) - want))
        print(f"   gather vs one-hot max abs err: {float(err):.3e}")
    except Exception as e:  # noqa: BLE001
        print(f"3. lane-gather: DOES NOT LOWER: {type(e).__name__}: {str(e)[:300]}")

    # 4. hat-only MXU microbench (same output shape [D, G/S])
    def hatmxu_scan(v, w_mat):
        def body(carry, _):
            out = hat_mxu_call(carry, w_mat)
            return out[0], ()  # d=0 slice feeds the next step: no DCE
        return jax.lax.scan(body, v, None, length=STEPS)[0]
    t4 = timeit(hatmxu_scan, v, w_mat)
    print(f"4. MXU one-hot hat-only: {t4*1e3:8.2f} ms / {STEPS} steps  ({t4/STEPS*1e6:7.1f} us/step)")


if __name__ == "__main__" and "--moments" not in sys.argv:
    main()


# ---- in-engine variant: moments-fused kernel, hat ablated ------------------

def _kernel_moments_ablate(v_ref, spot_ref, fac_ref, spot_prev_ref, fac_prev_ref,
                           mean_ref, std_ref, w_ref, dci_ref, a_ref, b_ref,
                           out_ref, xtx_ref, xty_t_ref,
                           *, monomials, num_decisions: int):
    f32 = jnp.float32
    v = v_ref[...]
    spot = spot_ref[...]
    dm = dk._build_design_rows(monomials, spot, fac_ref[...])
    dm = (dm - mean_ref[...]) / std_ref[...]
    dm_hi, dm_lo = dk._split_bf16(dm)
    b_dim = dm.shape[0]
    imm0 = a_ref[0] * spot + b_ref[0]
    best_reg = imm0
    best_act = v + imm0           # ABLATED hat
    for d in range(1, num_decisions):
        dci_hi, _ = dk._split_bf16(dci_ref[d])
        q = (
            jnp.dot(dci_hi, dm_hi, preferred_element_type=f32)
            + jnp.dot(dci_hi, dm_lo, preferred_element_type=f32)
        )
        imm = a_ref[d] * spot + b_ref[d]
        vr = q + imm
        va = v + imm              # ABLATED
        better = vr > best_reg
        best_reg = jnp.where(better, vr, best_reg)
        best_act = jnp.where(better, va, best_act)
    out_ref[...] = best_act
    dmp = dk._build_design_rows(monomials, spot_prev_ref[...], fac_prev_ref[...])
    dmp = (dmp - mean_ref[...]) / std_ref[...]
    cols = []
    for i in range(b_dim):
        cols.append(jnp.sum(dmp[i:i+1] * dmp, axis=1, keepdims=True))
    xtx_partial = jnp.concatenate(cols, axis=1)
    xty_cols = []
    for i in range(b_dim):
        xty_cols.append(jnp.sum(best_act * dmp[i:i+1], axis=1, keepdims=True))
    xty_t_partial = jnp.concatenate(xty_cols, axis=1)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        xtx_ref[...] = jnp.zeros_like(xtx_ref)
        xty_t_ref[...] = jnp.zeros_like(xty_t_ref)

    xtx_ref[...] += xtx_partial
    xty_t_ref[...] += xty_t_partial


def moments_bench():
    from storage_tpu.basis import parse_basis_functions

    monomials = tuple(parse_basis_functions(
        "1 + s + s*s + x0 + x0**2 + x1 + x1*x1 + x2 + x2**2"
    ))
    b_dim, f_dim = len(monomials), 3
    key = jax.random.key(7)
    ks = jax.random.split(key, 10)
    v = jax.random.normal(ks[0], (G, S), jnp.float32) * 10.0 + 100.0
    spot = jax.random.normal(ks[1], (S,), jnp.float32) * 0.1 + 20.0
    factors = jax.random.normal(ks[2], (f_dim, S), jnp.float32) * 0.1
    spot_p = jax.random.normal(ks[3], (S,), jnp.float32) * 0.1 + 20.0
    factors_p = jax.random.normal(ks[4], (f_dim, S), jnp.float32) * 0.1
    mean = jnp.zeros((b_dim,), jnp.float32) + 0.5
    std = jnp.ones((b_dim,), jnp.float32)
    idx_np = np.sort(np.random.default_rng(2).integers(0, G - 1, size=(G, D)), axis=0)
    idx = jnp.asarray(idx_np.astype(np.int32))
    w_hi = dk.snap_weights(jnp.asarray(np.random.default_rng(3).random((G, D)), jnp.float32))
    w_mat = dk.interp_weight_matrix(idx, w_hi, G, jnp.float32)
    ci = jax.random.normal(ks[5], (D, G, b_dim), jnp.float32)
    a = jax.random.normal(ks[6], (D, G), jnp.float32)
    bb = jax.random.normal(ks[7], (D, G), jnp.float32)

    def current_scan(v0):
        def body(carry, _):
            out, xtx, xty = dk.decision_update_moments_pallas(
                carry, spot, factors, spot_p, factors_p, mean, std,
                w_mat, ci, a, bb, monomials, sim_tile=TILE, pred_passes=2,
            )
            return out, (xtx[0, 0], xty[0, 0])
        return jax.lax.scan(body, v0, None, length=STEPS)[0]

    t = timeit(current_scan, v)
    print(f"5. moments kernel (in-engine form): {t*1e3:8.2f} ms / {STEPS} steps ({t/STEPS*1e6:7.1f} us/step)")

    w_bf = dk.snap_weights(w_mat).astype(jnp.bfloat16)
    dci = ci - ci[0:1]

    def ablate_call_m(v):
        return pl.pallas_call(
            functools.partial(_kernel_moments_ablate, monomials=monomials,
                              num_decisions=D),
            out_shape=(
                jax.ShapeDtypeStruct((G, S), v.dtype),
                jax.ShapeDtypeStruct((b_dim, b_dim), v.dtype),
                jax.ShapeDtypeStruct((G, b_dim), v.dtype),
            ),
            grid=(S // TILE,),
            in_specs=[
                pl.BlockSpec((G, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((f_dim, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((f_dim, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((b_dim, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((b_dim, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, G, G), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, G, b_dim), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, G, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((D, G, 1), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((G, TILE), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((b_dim, b_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((G, b_dim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ),
        )(v, spot[None, :], factors, spot_p[None, :], factors_p,
          mean[:, None], std[:, None], w_bf, dci, a[..., None], bb[..., None])

    def ablate_scan_m(v0):
        def body(carry, _):
            out, xtx, xty = ablate_call_m(carry)
            return out, (xtx[0, 0], xty[0, 0])
        return jax.lax.scan(body, v0, None, length=STEPS)[0]

    t2 = timeit(ablate_scan_m, v)
    print(f"6. moments kernel hat ABLATED     : {t2*1e3:8.2f} ms / {STEPS} steps ({t2/STEPS*1e6:7.1f} us/step)")
    print(f"   -> hat share of in-engine kernel step: {100*(1-t2/t):.1f}%")


if __name__ == "__main__" and "--moments" in sys.argv:
    moments_bench()
