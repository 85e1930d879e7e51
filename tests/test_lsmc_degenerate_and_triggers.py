"""LSMC degenerate cases (at/after storage end, day-before-end) and
trigger-price consistency properties — mirroring
LsmcStorageValuationTest.cs:209-311 and :1194-1290."""
import numpy as np
import jax.numpy as jnp
import pandas as pd
import pytest

from storage_tpu import CmdtyStorage, multi_factor_value

F64 = jnp.float64


def storage_simple(terminal=None):
    kwargs = dict(
        min_inventory=0.0, max_inventory=52_500.0,
        max_injection_rate=625.0, max_withdrawal_rate=850.0,
    )
    if terminal is not None:
        kwargs["terminal_storage_npv"] = terminal
    return CmdtyStorage("D", "2019-12-01", "2020-04-01", 1.23, 0.98, **kwargs)


def market(val_date="2019-08-29"):
    idx = pd.period_range(val_date, "2020-04-01", freq="D")
    i = np.arange(len(idx))
    fwd = pd.Series(index=idx, data=25.0 + 4.0 * np.sin(2 * np.pi * i / 365.0))
    rates = pd.Series(index=pd.period_range(val_date, "2020-06-01", freq="D"), data=0.0)

    def settle(period):  # same-day settlement, zero rates -> DF == 1
        return period.start_time.date()

    return fwd, rates, settle


def factors_1f(val_date):
    vol_idx = pd.period_range(val_date, "2020-06-01", freq="D")
    return [(14.5, pd.Series(index=vol_idx, data=0.95))]


def run(storage, val_date, inventory, num_sims=256, **over):
    fwd, rates, settle = market(min(val_date, "2019-12-01"))
    kwargs = dict(
        factors=factors_1f("2019-08-29"), factor_corrs=None, num_sims=num_sims,
        basis_funcs="1 + x0 + x0**2 + x0**3", discount_deltas=False,
        seed=11, fwd_sim_seed=13, dtype=F64, sim_data_returned="none",
    )
    kwargs.update(over)
    return multi_factor_value(
        storage, val_date, inventory, fwd, rates, settle, **kwargs
    )


class TestDegenerateCases:
    def test_after_end_zero_npv_empty_results(self):
        res = run(storage_simple(), "2020-04-02", 0.0)
        assert res.npv == 0.0
        assert res.deltas.empty
        assert res.expected_profile.empty
        assert res.trigger_prices.empty

    def test_at_end_must_be_empty_zero_npv(self):
        res = run(storage_simple(), "2020-04-01", 0.0)
        assert res.npv == 0.0
        assert res.deltas.empty

    def test_at_end_with_inventory_raises(self):
        with pytest.raises(ValueError, match="must be empty"):
            run(storage_simple(), "2020-04-01", 100.0)

    def test_at_end_terminal_value(self):
        res = run(
            storage_simple(terminal=lambda price, inv: 0.9 * price * inv),
            "2020-04-01", 1000.0,
        )
        fwd, _, _ = market("2019-12-01")  # the curve `run` builds for this val date
        expected = 0.9 * float(fwd[pd.Period("2020-04-01", freq="D")]) * 1000.0
        assert res.npv == pytest.approx(expected)

    def test_day_before_end_npv_equals_forced_withdrawal_value(self):
        """Must-be-empty storage one day before end: the only decision is to
        withdraw everything, so NPV = inventory * (spot - withdrawal cost)
        with DF == 1 (LsmcStorageValuationTest.cs:268-292)."""
        inventory = 352.14
        res = run(storage_simple(), "2020-03-31", inventory)
        fwd, _, _ = market("2019-12-01")
        spot = float(fwd[pd.Period("2020-03-31", freq="D")])
        # Spot on the val date is deterministic == forward price.
        expected = inventory * spot - 0.98 * inventory
        assert res.npv == pytest.approx(expected, rel=1e-9)

    def test_day_before_end_delta_equals_inventory(self):
        inventory = 352.14
        res = run(storage_simple(), "2020-03-31", inventory)
        assert res.deltas.iloc[0] == pytest.approx(inventory, rel=1e-9)


class TestTriggerPriceProperties:
    @pytest.fixture(scope="class")
    def result(self):
        return run(storage_simple(), "2019-12-15", 26_250.0, num_sims=4096)

    def test_withdraw_trigger_prices_increase_with_abs_volume(self, result):
        """Volumes are strictly ordered; prices are only endpoint-ordered —
        pointwise price monotonicity requires a convex continuation estimate,
        which the regression does not guarantee (the reference skips its
        equivalent assertion: LsmcStorageValuationTest.cs:1192 Skip)."""
        for profile in result.trigger_profiles:
            wdr = profile.withdraw_triggers
            for i in range(1, len(wdr)):
                assert wdr[i].volume < wdr[i - 1].volume
            if len(wdr) > 1:
                assert wdr[-1].price >= wdr[0].price - 0.1

    def test_inject_trigger_prices_decrease_with_volume(self, result):
        for profile in result.trigger_profiles:
            inj = profile.inject_triggers
            for i in range(1, len(inj)):
                assert inj[i].volume > inj[i - 1].volume
            if len(inj) > 1:
                # Monotone up to regression noise on the fitted continuation
                # (the volumes differ by one grid increment; ~1% of the price
                # scale of slack absorbs it).
                assert inj[-1].price <= inj[0].price + 0.3

    def test_withdraw_trigger_above_inject_trigger(self, result):
        tp_frame = result.trigger_prices
        both = tp_frame.dropna()
        assert len(both) > 0
        assert (
            both["withdraw_trigger_price"] > both["inject_trigger_price"]
        ).all()

    def test_trigger_volumes_consistent_with_rates(self, result):
        """Max trigger volumes respect the constant inject/withdraw rates and
        the space to the inventory bounds at the expected inventory
        (LsmcStorageValuationTest.cs:1257-1290)."""
        profile = result.expected_profile
        tp_frame = result.trigger_prices
        for period, row in tp_frame.iterrows():
            expected_inventory = profile.loc[period, "inventory"]
            if not np.isnan(row["inject_volume"]):
                assert row["inject_volume"] <= min(
                    625.0, 52_500.0 - expected_inventory
                ) + 1e-6
            if not np.isnan(row["withdraw_volume"]):
                assert -row["withdraw_volume"] <= min(850.0, expected_inventory) + 1e-6

    def test_zero_inventory_no_withdraw_trigger_first_period(self):
        res = run(storage_simple(), "2019-12-15", 0.0)
        first = res.trigger_prices.iloc[0]
        assert np.isnan(first["withdraw_volume"])
        assert np.isnan(first["withdraw_trigger_price"])
        assert len(res.trigger_profiles.iloc[0].withdraw_triggers) == 0

    def test_full_inventory_no_inject_trigger_first_period(self):
        res = run(storage_simple(), "2019-12-15", 52_500.0)
        first = res.trigger_prices.iloc[0]
        assert np.isnan(first["inject_volume"])
        assert np.isnan(first["inject_trigger_price"])
        assert len(res.trigger_profiles.iloc[0].inject_triggers) == 0
