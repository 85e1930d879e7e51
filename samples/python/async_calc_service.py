"""Asynchronous valuations through the handle-based calculation service.

The analog of the reference Excel add-in workflow (three_factor_storage.xlsm):
create a storage object under a name, queue an async three-factor valuation,
subscribe to progress/status, start it, and read result properties — all on
the native C++ job engine.
Run: python samples/python/async_calc_service.py
"""
import time

import numpy as np
import pandas as pd

from storage_tpu import CalcMode, CalculationService

idx = pd.period_range("2021-04-01", "2022-04-01", freq="D")
t = np.arange(len(idx))
fwd_curve = pd.Series(index=idx, data=28.0 + 6.0 * np.sin(2 * np.pi * (t - 120) / 365.0))
rates = pd.Series(index=pd.period_range("2021-04-01", "2022-06-01", freq="D"), data=0.03)


def settle(period: pd.Period):
    return (period.asfreq("M").asfreq("D", "end") + 20).start_time.date()


with CalculationService(num_threads=2, calc_mode=CalcMode.ASYNC) as svc:
    print("service:", svc.version(), svc.linear_algebra_provider())
    storage_handle = svc.create_storage(
        "my_storage",
        freq="D", storage_start="2021-04-01", storage_end="2022-04-01",
        injection_cost=0.01, withdrawal_cost=0.025,
        min_inventory=0.0, max_inventory=1500.0,
        max_injection_rate=25.5, max_withdrawal_rate=30.9,
    )
    print("storage handle:", storage_handle,
          "| max inject @ 0:", svc.storage_injection_rate(storage_handle, "2021-06-01", 0.0))

    calc_handle = svc.storage_value_three_factor(
        "my_valuation", storage_handle,
        val_date="2021-04-01", inventory=300.0, fwd_curve=fwd_curve,
        interest_rates=rates, settlement_rule=settle,
        spot_mean_reversion=91.0, spot_vol=0.85, long_term_vol=0.30,
        seasonal_vol=0.19, num_sims=2000,
        basis_funcs="1 + x_st + x_sw + x_lt + s + s**2",
        discount_deltas=False, seed=12,
    )
    svc.subscribe_progress(calc_handle, lambda p: print(f"  progress -> {p:.0%}"))
    svc.subscribe_status(calc_handle, lambda s: print(f"  status   -> {s.value}"))

    print("queued:", calc_handle, svc.calc_status(calc_handle).value)
    svc.start_pending(calc_handle)
    result = svc.calc_result(calc_handle)  # blocks until done
    time.sleep(0.1)  # let the last subscription pushes land
    print(f"NPV {result.npv:,.0f}  (intrinsic {result.intrinsic_npv:,.0f}, "
          f"extrinsic {result.extrinsic_npv:,.0f})")
    print("npv via property read:", f"{svc.get_object_property(calc_handle, 'npv'):,.0f}")
