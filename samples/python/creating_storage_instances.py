"""Creating storage facility instances.

Mirrors the reference's `creating_storage_instances.ipynb` and README
"Creating an Instance of CmdtyStorage" examples: constant-parameter storage,
time-varying series parameters, and inventory-dependent ratchets.
Run: python samples/python/creating_storage_instances.py
"""
import pandas as pd

from storage_tpu import CmdtyStorage, RatchetInterp

# --- Simple storage: constant rates and costs over a fixed window.
simple = CmdtyStorage(
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
print("simple storage:", simple.start, "->", simple.end)
print("  inject/withdraw range at 500:", simple.inject_withdraw_range("2021-06-01", 500.0))

# --- Time-varying constraints via pandas Series.
idx = pd.period_range("2021-04-01", "2022-04-01", freq="D")
seasonal_max_injection = pd.Series(index=idx, data=[20.0 if p.month in (4, 5, 6, 7, 8, 9) else 12.0 for p in idx])
time_varying = CmdtyStorage(
    freq="D",
    storage_start="2021-04-01",
    storage_end="2022-04-01",
    injection_cost=0.01,
    withdrawal_cost=0.025,
    min_inventory=0.0,
    max_inventory=1500.0,
    max_injection_rate=seasonal_max_injection,
    max_withdrawal_rate=30.9,
)
print("time-varying: summer inject", time_varying.inject_withdraw_range("2021-07-01", 0.0).max_inject_withdraw_rate,
      "winter inject", time_varying.inject_withdraw_range("2021-12-01", 0.0).max_inject_withdraw_rate)

# --- Inventory-dependent ratchets: (period, [(inventory, -withdraw, inject), ...]).
ratchet_storage = CmdtyStorage(
    freq="D",
    storage_start="2021-04-01",
    storage_end="2022-04-01",
    injection_cost=0.01,
    withdrawal_cost=0.025,
    ratchets=[
        ("2021-04-01", [(0.0, -150.0, 255.2), (2000.0, -200.0, 175.0), (5000.0, -260.8, 155.5), (7000.0, -330.0, 132.0)]),
        ("2022-01-01", [(0.0, -130.0, 260.0), (2000.0, -190.0, 190.0), (5000.0, -250.0, 160.0), (7000.0, -322.0, 141.0)]),
    ],
    ratchet_interp=RatchetInterp.LINEAR,
)
rng = ratchet_storage.inject_withdraw_range("2021-06-01", 3500.0)
print("ratcheted at 3500:", rng)

# --- Terminal value, fuel consumption and inventory loss.
full_featured = CmdtyStorage(
    freq="D",
    storage_start="2021-04-01",
    storage_end="2022-04-01",
    injection_cost=0.01,
    withdrawal_cost=0.025,
    min_inventory=0.0,
    max_inventory=1500.0,
    max_injection_rate=25.5,
    max_withdrawal_rate=30.9,
    cmdty_consumed_inject=0.01,   # 1% of injected gas burnt as fuel
    cmdty_consumed_withdraw=0.018,
    inventory_loss=0.001,          # 0.1% inventory lost per period
    inventory_cost=0.002,          # per-unit holding cost
    terminal_storage_npv=lambda spot, inventory: 0.97 * spot * inventory,
)
print("full-featured fuel on inject of 10 @ inv 100:",
      full_featured.cmdty_consumed_inject("2021-06-01", 100.0, 10.0))
