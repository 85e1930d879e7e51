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
    interpolation: str = "linear",
    grid_scheme: str = "linspace",
    grid_calc=None,
) -> IntrinsicValuationResults:
    """Intrinsic valuation (reference ``intrinsic.py:42-111``).

    ``numerical_tolerance`` is accepted for API parity; the branchless device
    kernels snap constrained decisions without a tolerance parameter.
    ``interpolation``: 'linear' (default) or 'cubic' (natural cubic spline in
    inventory, the reference's alternative interpolator factory).
    ``grid_scheme``: 'linspace' (default) or 'fixed_spacing' (the reference's
    grid layout; makes per-period intrinsic decisions exactly comparable to
    the reference's profiles).
    ``grid_calc``: user callable ``(lower, upper) -> grid points`` applied per
    period — the reference's open ``IDoubleStateSpaceGridCalc`` extension
    point (IDoubleStateSpaceGridCalc.cs:32); overrides ``grid_scheme``.
    """
    del numerical_tolerance  # no-op; see tests/test_numerical_tolerance.py
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
        interpolation=interpolation,
        grid_scheme=grid_scheme,
        grid_calc=grid_calc,
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


def trinomial_value(
    cmdty_storage: CmdtyStorage,
    val_date: pu.PeriodSpec,
    inventory: float,
    forward_curve: pd.Series,
    spot_volatility: pd.Series,
    mean_reversion: float,
    time_step: float,
    interest_rates: tp.Union[float, pd.Series],
    settlement_rule: tp.Optional[dsc.SettlementRule],
    num_inventory_grid_points: int = DEFAULT_NUM_GRID_POINTS,
    numerical_tolerance: float = 1e-12,
    dtype=jnp.float32,
    interpolation: str = "linear",
    grid_calc=None,
) -> float:
    """One-factor trinomial-tree storage valuation (reference
    ``trinomial.py:36-85``).  Returns the NPV.

    ``interpolation``: 'linear' (default) or 'cubic' — continuation-value
    interpolation in inventory, the reference's interpolator-factory choice
    (``IInterpolatorFactory``, InterpolatorFactories/IInterpolatorFactory.cs:33;
    cubic is documented there as occasionally poorly behaved).
    ``grid_calc``: user callable ``(lower, upper) -> grid points`` per period
    (``IDoubleStateSpaceGridCalc.GetGridPoints`` analog)."""
    del numerical_tolerance  # no-op; see tests/test_numerical_tolerance.py
    from .engines import tree as tree_engine
    from .models import trinomial_tree as tt

    storage = cmdty_storage
    freq = storage.start.freqstr
    val_period = pu.to_period(val_date, freq)

    if val_period > storage.end:
        return 0.0
    if val_period == storage.end:
        if storage.empty_at_end:
            if inventory > 0:
                raise ValueError(
                    "Storage must be empty at end, but inventory is greater than zero."
                )
            return 0.0
        price = float(forward_curve[val_period])
        return storage.terminal_storage_npv(price, inventory)

    if isinstance(spot_volatility.index, pd.PeriodIndex):
        if spot_volatility.index.freqstr != freq:
            raise ValueError(
                "cmdty_storage and spot_volatility have different frequencies."
            )
    inputs = prepare_valuation(
        storage, val_date, inventory, forward_curve, interest_rates, settlement_rule
    )
    # The tree starts at the valuation period (TreeStorageValuation.cs:171-184);
    # the storage DP starts at the first active period.
    tree_periods = pu.period_index(val_period, storage.end)
    fwd_tree = forward_curve.reindex(tree_periods)
    if fwd_tree.isna().any():
        raise ValueError(
            "Forward curve starts too late. Must start on or before the current period."
        )
    vols_tree = spot_volatility.reindex(tree_periods)
    if vols_tree.isna().any():
        raise ValueError("Spot volatility curve does not cover the valuation horizon.")
    tree = tt.build_tree(
        fwd_tree.to_numpy(dtype=np.float64),
        vols_tree.to_numpy(dtype=np.float64),
        mean_reversion,
        time_step,
    )
    offset = pu.period_offset(inputs.periods[0], val_period)
    result, _arrays, _tree_arrays = tree_engine.tree_valuation(
        inputs.compiled,
        tree,
        offset,
        inputs.starting_inventory,
        inputs.fwd,
        inputs.df_settle,
        inputs.df_flow,
        inputs.inventory_lower,
        inputs.inventory_upper,
        num_grid_points=num_inventory_grid_points,
        dtype=dtype,
        interpolation=interpolation,
        grid_calc=grid_calc,
    )
    return float(result.npv)


def trinomial_deltas(
    cmdty_storage: CmdtyStorage,
    val_date: pu.PeriodSpec,
    inventory: float,
    forward_curve: pd.Series,
    spot_volatility: pd.Series,
    mean_reversion: float,
    time_step: float,
    interest_rates: tp.Union[float, pd.Series],
    settlement_rule: tp.Optional[dsc.SettlementRule],
    fwd_contracts: tp.Iterable,
    num_inventory_grid_points: int = DEFAULT_NUM_GRID_POINTS,
    numerical_tolerance: float = 1e-12,
    delta_shift: tp.Optional[float] = None,
    dtype=jnp.float32,
    interpolation: str = "linear",
    grid_calc=None,
) -> tp.List[float]:
    """Deltas by central finite difference of the tree NPV in the forward
    curve, one bump per contract (reference ``trinomial.py:88-118``).
    ``fwd_contracts`` entries are period-likes or (start, end) range tuples.

    The default ``delta_shift`` is precision-aware: the reference's 1e-5 bump
    vanishes below float32 NPV resolution, so f32 valuations use 0.01.
    """
    if delta_shift is None:
        delta_shift = 1e-5 if jnp.dtype(dtype).itemsize >= 8 else 1e-2
    freq = cmdty_storage.start.freqstr
    deltas = []
    for contract in fwd_contracts:
        if isinstance(contract, tuple):
            start, end = (pu.to_period(c, freq) for c in contract)
        else:
            start = end = pu.to_period(contract, freq)
        bump = pd.Series(0.0, index=forward_curve.index)
        mask = (forward_curve.index >= start) & (forward_curve.index <= end)
        bump[mask] = delta_shift
        value_up = trinomial_value(
            cmdty_storage, val_date, inventory, forward_curve + bump, spot_volatility,
            mean_reversion, time_step, interest_rates, settlement_rule,
            num_inventory_grid_points, numerical_tolerance, dtype,
            interpolation=interpolation, grid_calc=grid_calc,
        )
        value_down = trinomial_value(
            cmdty_storage, val_date, inventory, forward_curve - bump, spot_volatility,
            mean_reversion, time_step, interest_rates, settlement_rule,
            num_inventory_grid_points, numerical_tolerance, dtype,
            interpolation=interpolation, grid_calc=grid_calc,
        )
        deltas.append((value_up - value_down) / (2.0 * delta_shift))
    return deltas


def _empty_profile(freq: str) -> pd.DataFrame:
    index = pd.PeriodIndex([], freq=pu.normalise_freq(freq))
    return profile_data_frame(
        index, np.array([]), np.array([]), np.array([]), np.array([]), np.array([])
    )
