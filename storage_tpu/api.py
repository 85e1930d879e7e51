"""Public valuation API, mirroring the reference Python package surface
(``cmdty_storage/__init__.py:36-43``): ``intrinsic_value``, ``trinomial_value``,
``trinomial_deltas``, ``three_factor_seasonal_value``, ``multi_factor_value``,
``value_from_sims`` — pandas in, pandas out, jax inside.
"""
from __future__ import annotations

import typing as tp

import jax.numpy as jnp
import numpy as np
import pandas as pd

from .engines import intrinsic as intrinsic_engine
from .facility import CmdtyStorage
from .utils import discount as dsc
from .utils import periods as pu
from .valuation_inputs import prepare_valuation

DEFAULT_NUM_GRID_POINTS = 100  # reference default (ExcelArg.cs:130, intrinsic.py:48)


class IntrinsicValuationResults(tp.NamedTuple):
    npv: float
    profile: pd.DataFrame


def profile_data_frame(
    periods: pd.PeriodIndex,
    inventory: np.ndarray,
    inject_withdraw: np.ndarray,
    cmdty_consumed: np.ndarray,
    inventory_loss: np.ndarray,
    period_pv: np.ndarray,
) -> pd.DataFrame:
    """Build the storage-profile frame with the reference column layout
    (``intrinsic.py:88-111``); ``net_volume = -inject_withdraw - consumed``
    (StorageProfile.cs:28)."""
    net_volume = -np.asarray(inject_withdraw) - np.asarray(cmdty_consumed)
    return pd.DataFrame(
        {
            "inventory": np.asarray(inventory, dtype=np.float64),
            "inject_withdraw_volume": np.asarray(inject_withdraw, dtype=np.float64),
            "cmdty_consumed": np.asarray(cmdty_consumed, dtype=np.float64),
            "inventory_loss": np.asarray(inventory_loss, dtype=np.float64),
            "net_volume": net_volume.astype(np.float64),
            "period_pv": np.asarray(period_pv, dtype=np.float64),
        },
        index=periods,
    )


def intrinsic_value(
    cmdty_storage: CmdtyStorage,
    val_date: pu.PeriodSpec,
    inventory: tp.Union[float, int],
    forward_curve: pd.Series,
    interest_rates: tp.Union[float, pd.Series],
    settlement_rule: tp.Optional[dsc.SettlementRule],
    num_inventory_grid_points: int = DEFAULT_NUM_GRID_POINTS,
    numerical_tolerance: float = 1e-12,
    dtype=jnp.float32,
) -> IntrinsicValuationResults:
    """Intrinsic valuation (reference ``intrinsic.py:42-111``).

    ``numerical_tolerance`` is accepted for API parity; the branchless device
    kernels snap constrained decisions without a tolerance parameter.
    """
    del numerical_tolerance
    storage = cmdty_storage
    val_period = pu.to_period(val_date, storage.start.freqstr)

    # Degenerate cases (IntrinsicStorageValuation.cs:128-152).
    if val_period > storage.end:
        return IntrinsicValuationResults(0.0, _empty_profile(storage.freq))
    if val_period == storage.end:
        if storage.empty_at_end:
            if inventory > 0:
                raise ValueError(
                    "Storage must be empty at end, but inventory is greater than zero."
                )
            return IntrinsicValuationResults(0.0, _empty_profile(storage.freq))
        price = float(forward_curve[val_period])
        return IntrinsicValuationResults(
            storage.terminal_storage_npv(price, inventory), _empty_profile(storage.freq)
        )

    inputs = prepare_valuation(
        storage, val_date, inventory, forward_curve, interest_rates, settlement_rule
    )
    result = intrinsic_engine.intrinsic_valuation(
        inputs.compiled,
        inputs.starting_inventory,
        inputs.fwd,
        inputs.df_settle,
        inputs.df_flow,
        inputs.inventory_lower,
        inputs.inventory_upper,
        num_grid_points=num_inventory_grid_points,
        dtype=dtype,
    )
    profile = profile_data_frame(
        inputs.periods,
        result.inventory,
        result.inject_withdraw,
        result.cmdty_consumed,
        result.inventory_loss,
        result.period_pv,
    )
    return IntrinsicValuationResults(float(result.npv), profile)


def _empty_profile(freq: str) -> pd.DataFrame:
    index = pd.PeriodIndex([], freq=pu.normalise_freq(freq))
    return profile_data_frame(
        index, np.array([]), np.array([]), np.array([]), np.array([]), np.array([])
    )
