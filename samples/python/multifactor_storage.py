"""Three-factor seasonal LSMC valuation of a ratcheted storage facility.

Mirrors the reference's `multifactor_storage.ipynb` / README "Three-Factor
Seasonal Model" example end-to-end: build a facility, value it with the
3-factor seasonal LSMC, inspect NPV split, deltas, expected profile and
trigger prices, then revalue from the returned simulations (`value_from_sims`)
and compute AD deltas through the whole valuation.
Run: python samples/python/multifactor_storage.py
"""
import numpy as np
import pandas as pd

from storage_tpu import (
    SimulationDataReturned,
    CmdtyStorage,
    RatchetInterp,
    three_factor_seasonal_value,
    value_from_sims,
)

# Facility: one-year daily storage with inventory-dependent ratchets.
storage = CmdtyStorage(
    freq="D",
    storage_start="2021-04-01",
    storage_end="2022-04-01",
    injection_cost=0.01,
    withdrawal_cost=0.025,
    ratchets=[
        ("2021-04-01", [(0.0, -150.0, 255.2), (2000.0, -200.0, 175.0), (5000.0, -260.8, 155.5)]),
    ],
    ratchet_interp=RatchetInterp.LINEAR,
)

# Market: seasonal forward curve + flat 3% rates; monthly settlement + 20 days.
idx = pd.period_range("2021-04-01", "2022-04-01", freq="D")
t = np.arange(len(idx))
fwd_curve = pd.Series(index=idx, data=28.0 + 6.0 * np.sin(2 * np.pi * (t - 120) / 365.0))
rates = pd.Series(index=pd.period_range("2021-04-01", "2022-06-01", freq="D"), data=0.03)


def twenty_days_after_month_end(period: pd.Period):
    return (period.asfreq("M").asfreq("D", "end") + 20).start_time.date()


results = three_factor_seasonal_value(
    storage,
    val_date="2021-04-01",
    inventory=1500.0,
    fwd_curve=fwd_curve,
    interest_rates=rates,
    settlement_rule=twenty_days_after_month_end,
    spot_mean_reversion=91.0,
    spot_vol=0.85,
    long_term_vol=0.30,
    seasonal_vol=0.19,
    num_sims=4000,
    basis_funcs="1 + x_st + x_sw + x_lt + x_st**2 + x_sw**2 + x_lt**2 + s + s**2",
    discount_deltas=False,
    seed=12,
    on_progress_update=lambda p: print(f"  progress {p:.0%}"),
    # Per-sim path panels are needed below for the value_from_sims round trip;
    # the default (NONE, the reference's own stated intent) streams paths
    # in-scan and returns no panels.
    sim_data_returned=SimulationDataReturned.ALL,
)

print(f"full NPV       {results.npv:>14,.0f}")
print(f"intrinsic NPV  {results.intrinsic_npv:>14,.0f}")
print(f"extrinsic NPV  {results.extrinsic_npv:>14,.0f}")
print(f"standard error {results.val_sim_standard_error:>14,.0f}")
print("\ndeltas (first 5):")
print(results.deltas.head())
print("\nexpected profile (first 5 rows):")
print(results.expected_profile.head())
print("\ntrigger prices (first 5 rows):")
print(results.trigger_prices.head())

# Revalue feeding back the returned simulations — reproduces the NPV exactly.
revalued = value_from_sims(
    storage, "2021-04-01", 1500.0, fwd_curve, rates, twenty_days_after_month_end,
    sim_spot_regress=results.sim_spot_regress,
    sim_spot_valuation=results.sim_spot_valuation,
    sim_factors_regress=results.sim_factors_regress,
    sim_factors_valuation=results.sim_factors_valuation,
    basis_funcs="1 + x_st + x_sw + x_lt + x_st**2 + x_sw**2 + x_lt**2 + s + s**2",
    discount_deltas=False,
    # Matching sim_data_returned flags keep both runs on the same forward
    # path (mismatched flags flip the fused kernel -> f32 tie-level diffs).
    sim_data_returned=SimulationDataReturned.ALL,
)
# f64 runs reproduce exactly; f32 device runs agree at tie level (ULP-scale
# regression differences flip a few near-tie decisions), well inside MC error.
gap_se = abs(revalued.npv - results.npv) / results.val_sim_standard_error
print(f"\nvalue_from_sims NPV {revalued.npv:,.0f} vs source {results.npv:,.0f} "
      f"({gap_se:.2f} standard errors)")
assert gap_se < 2.0
