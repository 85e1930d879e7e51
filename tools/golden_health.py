"""Multi-seed z-scan of the framework's NPV against the reference's pinned
regression baselines — the statistical health check behind the golden
re-pin protocol (any RNG-stream or estimator-quadrature change re-runs this
BEFORE re-pinning framework goldens; see docs/MATH.md and the round-3 RNG
notes).

For each seed, values the reference 2F and 3F-seasonal regression
facilities and reports z = (npv - reference_pin) / reference_SE.  A healthy
stream scatters z around the small in-sample offset; a biased quadrature
shows as a consistent shift across seeds.

Usage:
    python tools/golden_health.py                # 8 seeds x 8192 sims (CPU or TPU)
    SEEDS=16 SIMS=32768 python tools/golden_health.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))


def main():
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import numpy as np
    import pandas as pd

    from storage_tpu import multi_factor_value, three_factor_seasonal_value
    from test_lsmc import reg_market, simple_reg_storage

    num_seeds = int(os.environ.get("SEEDS", 8))
    num_sims = int(os.environ.get("SIMS", 8192))
    print(f"backend={jax.default_backend()} seeds={num_seeds} sims={num_sims}")

    val_date, fwd, rates, settle = reg_market()
    vol_idx = pd.period_range(val_date, "2020-06-01", freq="D")
    factors = [
        (0.0, pd.Series(index=vol_idx, data=0.14)),
        (16.2, pd.Series(index=vol_idx.copy(), data=1.15)),
    ]
    pins = {
        "2F": (1_780_380.7581833513, 21_405.33891571013),
        "3F": (1_766_460.137569665, 18_459.69670786117),
    }
    zs = {k: [] for k in pins}
    for seed in range(num_seeds):
        r2 = multi_factor_value(
            simple_reg_storage(), val_date, 0.0, fwd, rates, settle, factors,
            0.64, num_sims, "1 + x0 + x0**2 + x1 + x1*x1", False,
            seed=seed, fwd_sim_seed=1000 + seed,
        )
        r3 = three_factor_seasonal_value(
            simple_reg_storage(), val_date, 0.0, fwd, rates, settle,
            spot_mean_reversion=16.2, spot_vol=1.15, long_term_vol=0.14,
            seasonal_vol=0.18, num_sims=num_sims,
            basis_funcs="1 + x_st + x_sw + x_lt + x_st**2 + x_sw**2 + x_lt**2",
            discount_deltas=False, seed=seed, fwd_sim_seed=1000 + seed,
        )
        for key, res in (("2F", r2), ("3F", r3)):
            pin, se = pins[key]
            z = (res.npv - pin) / se
            zs[key].append(z)
            print(f"seed={seed:3d} {key}: npv={res.npv:,.0f} z={z:+.2f}")
    ok = True
    for key, vals in zs.items():
        arr = np.asarray(vals)
        mean_z = arr.mean()
        # The reference pin itself carries ~1 SE of its own MC error and the
        # framework estimator a small lower-bound bias, so the mean-z gate is
        # loose; per-seed outliers beyond 3 are flagged individually.
        flag = "" if abs(mean_z) < 1.5 and np.all(np.abs(arr) < 3) else "  <-- INVESTIGATE"
        ok = ok and not flag
        print(f"{key}: mean z={mean_z:+.2f}  min={arr.min():+.2f}  max={arr.max():+.2f}{flag}")
    print("HEALTH OK" if ok else "HEALTH SUSPECT")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
