"""Intrinsic engine tests.

Includes hand-computable cases, degenerate cases (modelled on
``test_intrinsic.py`` / ``IntrinsicStorageValuationTest.cs``), and a parity
check against the reference README C# example (README.md:404-440, NPV
10,827.21) using the same ratcheted facility and step forward curve.
"""
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from storage_tpu import CmdtyStorage, RatchetInterp, intrinsic_value


def flat_series(start, end, value, freq="D"):
    idx = pd.period_range(start, end, freq=freq)
    return pd.Series(index=idx, data=float(value))


class TestIntrinsicSimple:
    def test_buy_low_sell_high(self):
        # 3 decision days, prices 10/20/30, inject<=100/day, withdraw<=100/day,
        # max inventory 200, must be empty at end. Optimal: inject 100 @10,
        # withdraw 100 @30 => NPV = 100*(30-10) = 2000.
        storage = CmdtyStorage(
            "D", "2021-01-01", "2021-01-04", 0.0, 0.0,
            min_inventory=0.0, max_inventory=200.0,
            max_injection_rate=100.0, max_withdrawal_rate=100.0,
        )
        fwd = pd.Series(
            index=pd.period_range("2021-01-01", "2021-01-04", freq="D"),
            data=[10.0, 20.0, 30.0, 30.0],
        )
        res = intrinsic_value(
            storage, "2021-01-01", 0.0, fwd, 0.0, None,
            num_inventory_grid_points=11, dtype=jnp.float64,
        )
        assert res.npv == pytest.approx(2000.0)
        np.testing.assert_allclose(
            res.profile["inject_withdraw_volume"].to_numpy(), [100.0, 0.0, -100.0, 0.0]
        )
        np.testing.assert_allclose(res.profile["inventory"].to_numpy(), [100.0, 100.0, 0.0, 0.0])

    def test_injection_withdrawal_costs_reduce_npv(self):
        storage = CmdtyStorage(
            "D", "2021-01-01", "2021-01-04", 1.0, 2.0,
            min_inventory=0.0, max_inventory=200.0,
            max_injection_rate=100.0, max_withdrawal_rate=100.0,
        )
        fwd = pd.Series(
            index=pd.period_range("2021-01-01", "2021-01-04", freq="D"),
            data=[10.0, 20.0, 30.0, 30.0],
        )
        res = intrinsic_value(
            storage, "2021-01-01", 0.0, fwd, 0.0, None,
            num_inventory_grid_points=11, dtype=jnp.float64,
        )
        # 2000 - 100*1 (inject) - 100*2 (withdraw)
        assert res.npv == pytest.approx(1700.0)

    def test_no_spread_no_value(self):
        storage = CmdtyStorage(
            "D", "2021-01-01", "2021-01-06", 0.5, 0.5,
            min_inventory=0.0, max_inventory=500.0,
            max_injection_rate=100.0, max_withdrawal_rate=100.0,
        )
        fwd = flat_series("2021-01-01", "2021-01-06", 25.0)
        res = intrinsic_value(
            storage, "2021-01-01", 0.0, fwd, 0.0, None,
            num_inventory_grid_points=11, dtype=jnp.float64,
        )
        assert res.npv == pytest.approx(0.0, abs=1e-9)
        np.testing.assert_allclose(
            res.profile["inject_withdraw_volume"].to_numpy(), np.zeros(6), atol=1e-9
        )

    def test_forced_withdrawal_from_starting_inventory(self):
        # Must be empty at end; starting inventory must be sold even at a loss.
        storage = CmdtyStorage(
            "D", "2021-01-01", "2021-01-03", 0.0, 0.0,
            min_inventory=0.0, max_inventory=200.0,
            max_injection_rate=0.0, max_withdrawal_rate=100.0,
        )
        fwd = pd.Series(
            index=pd.period_range("2021-01-01", "2021-01-03", freq="D"),
            data=[15.0, 12.0, 10.0],
        )
        res = intrinsic_value(
            storage, "2021-01-01", 150.0, fwd, 0.0, None,
            num_inventory_grid_points=11, dtype=jnp.float64,
        )
        # Sell 100 on day 1 @15 and 50 on day 2 @12.
        assert res.npv == pytest.approx(100 * 15 + 50 * 12)

    def test_discounting_applied(self):
        storage = CmdtyStorage(
            "D", "2021-01-01", "2021-01-03", 0.0, 0.0,
            min_inventory=0.0, max_inventory=100.0,
            max_injection_rate=100.0, max_withdrawal_rate=100.0,
        )
        fwd = pd.Series(
            index=pd.period_range("2021-01-01", "2021-01-03", freq="D"),
            data=[10.0, 30.0, 30.0],
        )
        rate = 0.1

        def settle_next_day(period):
            return (period + 1).start_time.date()

        res = intrinsic_value(
            storage, "2021-01-01", 0.0, fwd, rate, settle_next_day,
            num_inventory_grid_points=5, dtype=jnp.float64,
        )
        df1 = np.exp(-1 / 365 * rate)  # settle on Jan 2 for the Jan 1 purchase
        df2 = np.exp(-2 / 365 * rate)  # settle on Jan 3 for the Jan 2 sale
        expected = -100 * 10.0 * df1 + 100 * 30.0 * df2
        assert res.npv == pytest.approx(expected, rel=1e-12)

    def test_terminal_value_collected(self):
        storage = CmdtyStorage(
            "D", "2021-01-01", "2021-01-03", 0.0, 0.0,
            min_inventory=0.0, max_inventory=100.0,
            max_injection_rate=100.0, max_withdrawal_rate=100.0,
            terminal_storage_npv=lambda price, inv: price * inv,
        )
        fwd = pd.Series(
            index=pd.period_range("2021-01-01", "2021-01-03", freq="D"),
            data=[10.0, 10.0, 30.0],
        )
        res = intrinsic_value(
            storage, "2021-01-01", 0.0, fwd, 0.0, None,
            num_inventory_grid_points=5, dtype=jnp.float64,
        )
        # Fill to the 100-unit cap on day 1, hold, collect terminal value at 30.
        assert res.npv == pytest.approx(-100 * 10 + 100 * 30)

    def test_cmdty_consumed_on_inject(self):
        storage = CmdtyStorage(
            "D", "2021-01-01", "2021-01-03", 0.0, 0.0,
            min_inventory=0.0, max_inventory=100.0,
            max_injection_rate=100.0, max_withdrawal_rate=100.0,
            cmdty_consumed_inject=0.02,
        )
        fwd = pd.Series(
            index=pd.period_range("2021-01-01", "2021-01-03", freq="D"),
            data=[10.0, 30.0, 30.0],
        )
        res = intrinsic_value(
            storage, "2021-01-01", 0.0, fwd, 0.0, None,
            num_inventory_grid_points=5, dtype=jnp.float64,
        )
        # Inject 100 (consumes 2 extra units bought at 10), withdraw 100 at 30.
        assert res.npv == pytest.approx(-100 * 10 - 2 * 10 + 100 * 30)


class TestIntrinsicDegenerate:
    def make(self):
        return CmdtyStorage(
            "D", "2021-01-01", "2021-01-10", 0.0, 0.0,
            min_inventory=0.0, max_inventory=100.0,
            max_injection_rate=10.0, max_withdrawal_rate=10.0,
            terminal_storage_npv=lambda p, i: p * i,
        )

    def test_expired_storage(self):
        fwd = flat_series("2021-01-01", "2021-02-01", 10.0)
        res = intrinsic_value(self.make(), "2021-01-20", 0.0, fwd, 0.0, None)
        assert res.npv == 0.0
        assert len(res.profile) == 0

    def test_val_date_at_end(self):
        fwd = flat_series("2021-01-01", "2021-01-10", 10.0)
        res = intrinsic_value(self.make(), "2021-01-10", 40.0, fwd, 0.0, None)
        assert res.npv == pytest.approx(400.0)

    def test_val_date_at_end_must_be_empty_with_inventory_raises(self):
        storage = CmdtyStorage(
            "D", "2021-01-01", "2021-01-10", 0.0, 0.0,
            min_inventory=0.0, max_inventory=100.0,
            max_injection_rate=10.0, max_withdrawal_rate=10.0,
        )
        fwd = flat_series("2021-01-01", "2021-01-10", 10.0)
        with pytest.raises(ValueError, match="empty at end"):
            intrinsic_value(storage, "2021-01-10", 40.0, fwd, 0.0, None)

    def test_negative_inventory_raises(self):
        fwd = flat_series("2021-01-01", "2021-01-10", 10.0)
        with pytest.raises(ValueError, match="negative"):
            intrinsic_value(self.make(), "2021-01-01", -1.0, fwd, 0.0, None)

    def test_forward_curve_too_short_raises(self):
        fwd = flat_series("2021-01-01", "2021-01-08", 10.0)
        with pytest.raises(ValueError, match="Forward curve"):
            intrinsic_value(self.make(), "2021-01-01", 0.0, fwd, 0.0, None)


class TestReadmeParity:
    """Reference intrinsic sample (samples/csharp/Cmdty.Storage.Samples.Intrinsic/
    Program.cs:31-84, printed in README.md:436-440): simple daily storage
    Sep-2019 (inject <= 5.26/day, withdraw <= 14.74/day, max inventory 1100.74),
    step forward curve 56.6 -> 144.41 on Sep 23, no discounting, NPV 10,827.21."""

    def make_storage(self):
        return CmdtyStorage(
            "D", "2019-09-01", "2019-10-01", 0.48, 0.74,
            min_inventory=0.0, max_inventory=1100.74,
            max_injection_rate=5.26, max_withdrawal_rate=14.74,
        )

    def make_fwd(self):
        idx = pd.period_range("2019-09-15", "2019-10-01", freq="D")
        values = [56.6 if p < pd.Period("2019-09-23", freq="D") else 56.6 + 87.81 for p in idx]
        return pd.Series(index=idx, data=values)

    def test_npv_close_to_reference(self):
        res = intrinsic_value(
            self.make_storage(), "2019-09-15", 50.0, self.make_fwd(), 0.0, None,
            num_inventory_grid_points=101, dtype=jnp.float64,
        )
        # The reference uses fixed grid spacing 10.0 over [0, 1000] (101 pts);
        # our per-period linspace grid differs slightly, so allow 0.1%.
        assert res.npv == pytest.approx(10827.21, rel=1e-3)
