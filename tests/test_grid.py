"""Inventory-space reduction + bang-bang decision set tests, modelled on the
reference's ``StorageHelperTest.cs`` hand-computed cases."""
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from storage_tpu import CmdtyStorage, InventoryConstraintsCannotBeFulfilledException
from storage_tpu.grid import (
    bang_bang_decisions,
    calculate_inventory_space,
    inventory_grids,
    ratchet_rates,
)


def make_storage(**kwargs):
    defaults = dict(
        freq="D",
        storage_start="2021-01-01",
        storage_end="2021-01-11",
        injection_cost=0.0,
        withdrawal_cost=0.0,
        min_inventory=0.0,
        max_inventory=1000.0,
        max_injection_rate=100.0,
        max_withdrawal_rate=100.0,
    )
    defaults.update(kwargs)
    return CmdtyStorage(**defaults)


class TestInventorySpace:
    def test_simple_band_must_be_empty(self):
        # 10 decision days, +/-100/day, start inventory 300, must be empty at end.
        storage = make_storage()
        lower, upper = calculate_inventory_space(storage, 300.0, "2021-01-01")
        assert len(lower) == 11
        assert lower[0] == upper[0] == 300.0
        # Forward expansion (+100/day from 300) meets the backward draw-down
        # requirement (0 at end, so upper[i] <= (10 - i) * 100).
        np.testing.assert_allclose(
            upper[1:], [400, 500, 600, 600, 500, 400, 300, 200, 100, 0]
        )
        # Lower drains at the max withdrawal rate then floors at zero.
        np.testing.assert_allclose(lower[1:], [200, 100, 0, 0, 0, 0, 0, 0, 0, 0])

    def test_band_with_terminal_inventory_allowed(self):
        storage = make_storage(terminal_storage_npv=lambda p, i: 0.0)
        lower, upper = calculate_inventory_space(storage, 300.0, "2021-01-01")
        assert upper[-1] == 1000.0

    def test_infeasible_raises(self):
        # Must be empty at end but max withdrawal cannot empty in time.
        storage = make_storage(max_withdrawal_rate=10.0)
        with pytest.raises(InventoryConstraintsCannotBeFulfilledException):
            calculate_inventory_space(storage, 900.0, "2021-01-01")

    def test_val_date_inside_window(self):
        storage = make_storage()
        lower, upper = calculate_inventory_space(storage, 100.0, "2021-01-06")
        assert len(lower) == 6  # 5 remaining decision days + end

    def test_expired_raises(self):
        storage = make_storage()
        with pytest.raises(ValueError, match="expired"):
            calculate_inventory_space(storage, 0.0, "2021-02-01")

    def test_forced_injection_min_inventory_ramp(self):
        # Min inventory rises over time, forcing the lower band up.
        idx = pd.period_range("2021-01-01", "2021-01-11", freq="D")
        min_inv = pd.Series(index=idx, data=np.linspace(0.0, 500.0, len(idx)))
        storage = make_storage(min_inventory=min_inv, terminal_storage_npv=lambda p, i: 0.0)
        lower, upper = calculate_inventory_space(storage, 0.0, "2021-01-01")
        assert lower[-1] >= 500.0 - 1e-9

    def test_grids(self):
        lower = np.array([10.0, 0.0, 0.0])
        upper = np.array([10.0, 50.0, 100.0])
        grids = inventory_grids(lower, upper, 5)
        assert grids.shape == (3, 5)
        np.testing.assert_allclose(grids[0], np.full(5, 10.0))
        np.testing.assert_allclose(grids[1], [0, 12.5, 25, 37.5, 50])


class TestBangBang:
    def run(self, min_rate, max_rate, inventory, loss, next_min, next_max, extra=0):
        d = bang_bang_decisions(
            jnp.asarray(min_rate, jnp.float64),
            jnp.asarray(max_rate, jnp.float64),
            jnp.asarray(inventory, jnp.float64),
            jnp.asarray(loss, jnp.float64),
            jnp.asarray(next_min, jnp.float64),
            jnp.asarray(next_max, jnp.float64),
            extra,
        )
        return np.asarray(d)

    def test_unconstrained_with_zero(self):
        # StorageHelperTest-style: w/i both feasible, zero allowed.
        d = self.run(-70.0, 50.0, 500.0, 0.0, 0.0, 1000.0)
        np.testing.assert_allclose(d, [-70.0, 0.0, 50.0])

    def test_constrained_withdrawal(self):
        # Next-step min stops full withdrawal: yields next_min - inv.
        d = self.run(-70.0, 50.0, 500.0, 0.0, 480.0, 1000.0)
        np.testing.assert_allclose(d, [-20.0, 0.0, 50.0])

    def test_constrained_injection(self):
        d = self.run(-70.0, 50.0, 500.0, 0.0, 0.0, 520.0)
        np.testing.assert_allclose(d, [-70.0, 0.0, 20.0])

    def test_forced_withdrawal_no_zero(self):
        # next_max below inventory: both endpoints negative, no hold decision.
        d = self.run(-70.0, 50.0, 500.0, 0.0, 0.0, 450.0)
        np.testing.assert_allclose(d, [-70.0, -70.0, -50.0])

    def test_forced_injection_no_zero(self):
        d = self.run(-70.0, 50.0, 500.0, 0.0, 520.0, 1000.0)
        np.testing.assert_allclose(d, [20.0, 20.0, 50.0])

    def test_inventory_loss_shifts_decisions(self):
        # Loss of 1% on 500 = 5 units: decisions relative to inv-after-loss 495.
        d = self.run(-70.0, 50.0, 500.0, 0.01, 490.0, 1000.0)
        np.testing.assert_allclose(d, [-5.0, 0.0, 50.0])

    def test_extra_decisions(self):
        d = self.run(-70.0, 50.0, 500.0, 0.0, 0.0, 1000.0, extra=1)
        np.testing.assert_allclose(d, [-70.0, -35.0, 0.0, 25.0, 50.0])

    def test_vectorised_over_inventories(self):
        d = bang_bang_decisions(
            jnp.asarray([-70.0, -70.0]),
            jnp.asarray([50.0, 50.0]),
            jnp.asarray([500.0, 0.0]),
            jnp.asarray([0.0, 0.0]),
            0.0,
            1000.0,
            0,
        )
        np.testing.assert_allclose(np.asarray(d), [[-70.0, 0.0, 50.0], [0.0, 0.0, 50.0]])


class TestRatchetRates:
    def test_linear_lerp(self):
        inv = jnp.asarray([0.0, 500.0, 1000.0])
        mn = jnp.asarray([-10.0, -30.0, -50.0])
        mx = jnp.asarray([40.0, 30.0, 20.0])
        min_rate, max_rate = ratchet_rates(inv, mn, mx, False, jnp.asarray(250.0))
        assert float(min_rate) == pytest.approx(-20.0)
        assert float(max_rate) == pytest.approx(35.0)

    def test_step_lookup(self):
        inv = jnp.asarray([0.0, 500.0, 1000.0])
        mn = jnp.asarray([-10.0, -30.0, -30.0])
        mx = jnp.asarray([40.0, 30.0, 30.0])
        min_rate, max_rate = ratchet_rates(inv, mn, mx, True, jnp.asarray(499.0))
        assert float(max_rate) == 40.0
        min_rate, max_rate = ratchet_rates(inv, mn, mx, True, jnp.asarray(500.0))
        assert float(max_rate) == 30.0

    def test_clamps_outside_range(self):
        inv = jnp.asarray([0.0, 1000.0])
        mn = jnp.asarray([-10.0, -10.0])
        mx = jnp.asarray([40.0, 40.0])
        min_rate, max_rate = ratchet_rates(inv, mn, mx, False, jnp.asarray(2000.0))
        assert float(max_rate) == 40.0
