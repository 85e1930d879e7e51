"""Handle-based async calculation service (the Excel add-in analog, SURVEY §2.4)."""
import time

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from storage_tpu.calc_service import (
    CalcMode,
    CalcStatus,
    CalculationService,
    ObjectCache,
)

F64 = jnp.float64


def _storage_kwargs():
    return dict(
        freq="D", storage_start="2019-12-01", storage_end="2020-01-10",
        injection_cost=1.23, withdrawal_cost=0.98,
        min_inventory=0.0, max_inventory=10_000.0,
        max_injection_rate=700.0, max_withdrawal_rate=700.0,
    )


def _market():
    idx = pd.period_range("2019-11-20", "2020-01-10", freq="D")
    fwd = pd.Series(index=idx, data=np.linspace(23.0, 28.0, len(idx)))
    rates = pd.Series(
        index=pd.period_range("2019-11-20", "2020-03-01", freq="D"), data=0.03
    )

    def settle(period):
        return (period.asfreq("M").asfreq("D", "end") + 20).start_time.date()

    return fwd, rates, settle


def test_object_cache_versioning():
    cache = ObjectCache()
    h1 = cache.add("storage", 1)
    h2 = cache.add("storage", 2)
    assert h1 == "storage#1" and h2 == "storage#2"
    assert cache.get(h2) == 2
    with pytest.raises(KeyError):
        cache.get(h1)  # superseded handles are evicted
    assert len(cache) == 1


def test_storage_probes_and_info():
    with CalculationService() as svc:
        handle = svc.create_storage("store1", **_storage_kwargs())
        assert handle == "store1#1"
        assert svc.storage_injection_rate(handle, "2019-12-05", 100.0) == 700.0
        assert svc.storage_withdrawal_rate(handle, "2019-12-05", 100.0) == 700.0
        assert svc.storage_min_inventory(handle, "2019-12-05") == 0.0
        assert svc.storage_max_inventory(handle, "2019-12-05") == 10_000.0
        assert svc.version()
        assert svc.linear_algebra_provider().startswith("XLA:")


def test_async_three_factor_calc_with_subscriptions():
    fwd, rates, settle = _market()
    with CalculationService(calc_mode=CalcMode.ASYNC) as svc:
        sh = svc.create_storage("fac", **_storage_kwargs())
        ch = svc.storage_value_three_factor(
            "calc1", sh, val_date="2019-11-20", inventory=0.0, fwd_curve=fwd,
            interest_rates=rates, settlement_rule=settle,
            spot_mean_reversion=16.2, spot_vol=1.15, long_term_vol=0.14,
            seasonal_vol=0.18, num_sims=128,
            basis_funcs="1 + x_st + x_lt + x_sw", discount_deltas=False,
            seed=11, fwd_sim_seed=11, dtype=F64, sim_data_returned="none",
        )
        assert svc.calc_status(ch) == CalcStatus.PENDING
        progresses, statuses = [], []
        svc.subscribe_progress(ch, progresses.append)
        svc.subscribe_status(ch, statuses.append)
        svc.start_pending(ch)
        result = svc.calc_result(ch)
        assert np.isfinite(result.npv)
        deadline = time.time() + 5.0
        while time.time() < deadline and (
            not progresses or progresses[-1] != 1.0 or CalcStatus.SUCCESS not in statuses
        ):
            time.sleep(0.02)
        assert progresses and progresses[-1] == 1.0
        assert CalcStatus.SUCCESS in statuses
        assert svc.get_object_property(ch, "npv") == result.npv


def test_cancel_before_start_and_reset():
    fwd, rates, settle = _market()
    with CalculationService(calc_mode=CalcMode.ASYNC) as svc:
        sh = svc.create_storage("fac", **_storage_kwargs())
        ch = svc.storage_value_three_factor(
            "calc2", sh, val_date="2019-11-20", inventory=0.0, fwd_curve=fwd,
            interest_rates=rates, settlement_rule=settle,
            spot_mean_reversion=16.2, spot_vol=1.15, long_term_vol=0.14,
            seasonal_vol=0.18, num_sims=64,
            basis_funcs="1 + x_st", discount_deltas=False, dtype=F64,
            sim_data_returned="none",
        )
        svc.cancel_running(ch)
        assert svc.calc_status(ch) == CalcStatus.CANCELLED
        svc.start_pending(ch)  # no-op while cancelled
        assert svc.calc_status(ch) == CalcStatus.CANCELLED
        svc.reset_cancelled(ch)
        assert svc.calc_status(ch) == CalcStatus.PENDING
        svc.start_pending(ch)
        assert np.isfinite(svc.calc_result(ch).npv)


def test_blocking_mode_and_trinomial_and_intrinsic():
    fwd, rates, settle = _market()
    with CalculationService(calc_mode=CalcMode.BLOCKING) as svc:
        sh = svc.create_storage("fac", **_storage_kwargs())
        ih = svc.storage_intrinsic_value(
            "icalc", sh, val_date="2019-11-20", inventory=0.0, forward_curve=fwd,
            interest_rates=rates, settlement_rule=settle, dtype=F64,
        )
        assert svc.calc_status(ih) == CalcStatus.SUCCESS
        intrinsic = svc.calc_result(ih)
        th = svc.storage_value_trinomial_tree(
            "tcalc", sh, val_date="2019-11-20", inventory=0.0, forward_curve=fwd,
            interest_rates=rates, settlement_rule=settle,
            spot_volatility=pd.Series(index=fwd.index, data=0.6),
            mean_reversion=14.5, time_step=1 / 365.0, dtype=F64,
        )
        tree_npv = svc.calc_result(th)
        # Tree value embeds optionality: >= intrinsic (within tree noise).
        assert float(tree_npv) >= float(intrinsic.npv) - 1e-6
        vh = svc.storage_value_intrinsic(
            "vcalc", sh, val_date="2019-11-20", inventory=0.0, forward_curve=fwd,
            interest_rates=rates, settlement_rule=settle, dtype=F64,
        )
        assert svc.calc_result(vh) == pytest.approx(float(intrinsic.npv))
        assert svc.number_of_running_calculations == 0
