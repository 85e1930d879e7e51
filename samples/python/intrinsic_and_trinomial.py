"""Intrinsic and one-factor trinomial-tree valuations.

Mirrors the reference README's C# "Storage Intrinsic Valuation" and "One-Factor
Trinomial Tree" examples through the Python API.
Run: python samples/python/intrinsic_and_trinomial.py
"""
import numpy as np
import pandas as pd

from storage_tpu import CmdtyStorage, intrinsic_value, trinomial_value, trinomial_deltas

storage = CmdtyStorage(
    freq="D",
    storage_start="2021-04-01",
    storage_end="2022-04-01",
    injection_cost=0.01,
    withdrawal_cost=0.025,
    min_inventory=0.0,
    max_inventory=1500.0,
    max_injection_rate=25.5,
    max_withdrawal_rate=30.9,
)

idx = pd.period_range("2021-04-01", "2022-04-01", freq="D")
t = np.arange(len(idx))
fwd_curve = pd.Series(index=idx, data=28.0 + 6.0 * np.sin(2 * np.pi * (t - 120) / 365.0))
rates = pd.Series(index=pd.period_range("2021-04-01", "2022-06-01", freq="D"), data=0.03)


def settle(period: pd.Period):
    return (period.asfreq("M").asfreq("D", "end") + 20).start_time.date()


intrinsic = intrinsic_value(
    storage, "2021-04-01", 300.0, fwd_curve,
    settlement_rule=settle, interest_rates=rates,
)
print(f"intrinsic NPV {intrinsic.npv:,.2f}")
print(intrinsic.profile.head())

spot_vol = pd.Series(index=idx, data=0.85)
tree_npv = trinomial_value(
    storage, "2021-04-01", 300.0, fwd_curve,
    interest_rates=rates, settlement_rule=settle,
    spot_volatility=spot_vol, mean_reversion=14.5, time_step=1 / 365.0,
)
print(f"trinomial NPV {float(tree_npv):,.2f} (extrinsic {float(tree_npv) - intrinsic.npv:,.2f})")

# One delta per monthly forward contract, by central finite difference.
months = pd.period_range("2021-04", "2022-03", freq="M")
contracts = [(m.asfreq("D", "start"), m.asfreq("D", "end")) for m in months]
deltas = trinomial_deltas(
    storage, "2021-04-01", 300.0, fwd_curve,
    interest_rates=rates, settlement_rule=settle,
    spot_volatility=spot_vol, mean_reversion=14.5, time_step=1 / 365.0,
    fwd_contracts=contracts,
)
print("trinomial monthly deltas (first 5):", [round(d, 2) for d in deltas[:5]])
