"""LSMC engine oracle tests.

Mirrors the reference's validation strategy (``LsmcStorageValuationTest.cs``):
1. storage contorted into a strip of calls vs Black-76 (NPV within [-2%, 0%]
   — lower-bound estimator — and deltas within 2%), fixture per
   ``TestHelper.CreateThreeCallsLikeStorageTestData`` (TestHelper.cs:110-216);
2. near-zero vol LSMC ~ intrinsic;
3. regression baselines within 2 MC standard errors (test_multi_factor.py:99,259);
4. value_from_sims identity (test_multi_factor.py:126-197);
5. behavioural invariants (sim_data_returned never changes the numbers).
"""
import math

import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest
from scipy.stats import norm

from storage_tpu import (
    CmdtyStorage,
    RatchetInterp,
    SimulationDataReturned,
    multi_factor_value,
    three_factor_seasonal_value,
    value_from_sims,
)

F64 = jnp.float64


def black76_call(fwd, strike, implied_vol, t, df):
    vrt = implied_vol * math.sqrt(t)
    d1 = (math.log(fwd / strike) + implied_vol**2 / 2 * t) / vrt
    d2 = d1 - vrt
    return df * (fwd * norm.cdf(d1) - strike * norm.cdf(d2))


def black76_delta_undiscounted(fwd, strike, implied_vol, t):
    vrt = implied_vol * math.sqrt(t)
    d1 = (math.log(fwd / strike) + implied_vol**2 / 2 * t) / vrt
    return norm.cdf(d1)


def one_factor_implied_vol(spot_vol, mean_reversion, t):
    # Integrated OU variance annualised (TestHelper.cs:76-86).
    one_factor_variance = (1 - math.exp(-2 * mean_reversion * t)) / 2.0 / mean_reversion
    return spot_vol * math.sqrt(one_factor_variance / t)


def sinusoidal_curves(start, end):
    """Daily forward and spot-vol curves (TestHelper.cs:88-108)."""
    idx = pd.period_range(start, end, freq="D")
    i = np.arange(len(idx))
    fwd = 53.5 + np.sin(2 * np.pi / 365.0 * i) * 24.6
    vol = 0.78 + np.sin(2 * np.pi / 365.0 * i) * 0.35
    return pd.Series(index=idx, data=fwd), pd.Series(index=idx.copy(), data=vol)


class TestStorageLikeCallsBlack76:
    """Three forced-exercise windows replicate a strip of call options
    (LsmcStorageValuationTest.cs:314-423)."""

    VAL_DATE = "2019-08-29"
    MEAN_REVERSION = 16.5
    INTEREST_RATE = 0.09
    OPTIONS = [  # (expiry, notional, strike_premium, settle date)
        ("2019-12-15", 1200.0, 0.0, "2020-01-20"),
        ("2020-01-20", 800.0, 2.0, "2020-02-18"),
        ("2020-03-31", 900.0, 2.8, "2020-04-22"),
    ]

    @pytest.fixture(scope="class")
    def valuation(self):
        fwd, vol = sinusoidal_curves(self.VAL_DATE, "2020-04-01")
        total_notional = sum(o[1] for o in self.OPTIONS)
        settle_map = {
            "2019-12": "2020-01-20",
            "2020-01": "2020-02-18",
            "2020-02": "2020-03-21",
            "2020-03": "2020-04-22",
        }

        def settlement_rule(period):
            return pd.Timestamp(settle_map[str(period.asfreq('M'))]).date()

        # Ratchets: no actions anywhere except full-notional withdrawal on the
        # three exercise dates.
        def zero_rates(day):
            return (day, [(0.0, 0.0, 0.0), (total_notional, 0.0, 0.0)])

        ratchets = [zero_rates("2019-12-01")]
        strikes = {}
        wdr_cost = pd.Series(
            index=pd.period_range("2019-12-01", "2020-03-31", freq="D"), data=0.0
        )
        for expiry, notional, premium, _settle in self.OPTIONS:
            p = pd.Period(expiry, freq="D")
            strikes[p] = float(fwd[p]) + premium
            ratchets.append((expiry, [(0.0, -notional, 0.0), (total_notional, -notional, 0.0)]))
            ratchets.append(zero_rates((p + 1).strftime("%Y-%m-%d")))
            # Withdrawing = exercising: pay the strike per unit via the
            # withdrawal cost, settled on the same date as the commodity leg.
            wdr_cost[p] = strikes[p]

        storage = CmdtyStorage(
            "D", "2019-12-01", "2020-04-01", 0.0, wdr_cost,
            ratchets=ratchets, ratchet_interp=RatchetInterp.LINEAR,
            terminal_storage_npv=lambda price, inv: 0.0,
            cost_settlement_rule=settlement_rule,
        )
        rates = pd.Series(
            index=pd.period_range(self.VAL_DATE, "2020-06-01", freq="D"),
            data=self.INTEREST_RATE,
        )
        result = multi_factor_value(
            storage, self.VAL_DATE, total_notional, fwd, rates, settlement_rule,
            [(self.MEAN_REVERSION, vol)], None, 131_072,
            "1 + x0 + x0**2 + x0**3 + s", False, seed=11, fwd_sim_seed=13,
            num_inventory_grid_points=100, dtype=F64,
            sim_data_returned=SimulationDataReturned.NONE,
        )
        return result, fwd, vol, strikes

    def expected_option_values(self, fwd, vol, strikes, discounted=True):
        val_day = pd.Timestamp(self.VAL_DATE).date()
        values = []
        for expiry, notional, _premium, settle in self.OPTIONS:
            p = pd.Period(expiry, freq="D")
            t = (pd.Timestamp(expiry).date() - val_day).days / 365.0
            t_settle = (pd.Timestamp(settle).date() - val_day).days / 365.0
            df = math.exp(-self.INTEREST_RATE * t_settle) if discounted else 1.0
            iv = one_factor_implied_vol(float(vol[p]), self.MEAN_REVERSION, t)
            values.append(black76_call(float(fwd[p]), strikes[p], iv, t, df) * notional)
        return values

    def test_npv_within_band_of_black76(self, valuation):
        result, fwd, vol, strikes = valuation
        expected = sum(self.expected_option_values(fwd, vol, strikes))
        pcnt_error = (result.npv - expected) / expected
        # LSMC is a lower-bound estimator: within [-2%, 0%] in expectation
        # (LsmcStorageValuationTest.cs:361-366).  At 131,072 sims the MC
        # standard error is ~0.18%, so the upper edge gets a 2-SE allowance
        # (~0.35%); a multi-seed study showed the estimator mean sits ~-0.2%
        # with no upward bias.
        slack = 2.0 * result.val_sim_standard_error / expected
        assert -0.02 <= pcnt_error <= slack

    def test_deltas_match_black76(self, valuation):
        result, fwd, vol, strikes = valuation
        val_day = pd.Timestamp(self.VAL_DATE).date()
        for expiry, notional, _premium, _settle in self.OPTIONS:
            p = pd.Period(expiry, freq="D")
            t = (pd.Timestamp(expiry).date() - val_day).days / 365.0
            iv = one_factor_implied_vol(float(vol[p]), self.MEAN_REVERSION, t)
            expected_delta = black76_delta_undiscounted(float(fwd[p]), strikes[p], iv, t) * notional
            # Reference band 2% (LsmcStorageValuationTest.cs:368-423).
            assert result.deltas[p] == pytest.approx(expected_delta, rel=0.02)

    def test_deltas_zero_on_non_option_days(self, valuation):
        result, *_ = valuation
        option_days = {pd.Period(o[0], freq="D") for o in self.OPTIONS}
        for p, delta in result.deltas.items():
            if p not in option_days:
                assert delta == pytest.approx(0.0, abs=1e-9)


def simple_reg_storage():
    """The regression facility of test_multi_factor.py:36-50."""
    return CmdtyStorage(
        "D", "2019-12-01", "2020-04-01", 1.23, 0.98,
        min_inventory=0.0, max_inventory=100_000.0,
        max_injection_rate=700.0, max_withdrawal_rate=700.0,
    )


def reg_market():
    val_date = "2019-08-29"
    idx = pd.period_range(val_date, "2020-04-01", freq="D")
    fwd = pd.Series(
        index=idx,
        data=[23.87 if p < pd.Period("2020-03-12", freq="D") else 150.32 for p in idx],
    )
    rates = pd.Series(index=pd.period_range(val_date, "2020-06-01", freq="D"), data=0.03)

    def settle(period):
        return (period.asfreq("M").asfreq("D", "end") + 20).start_time.date()

    return val_date, fwd, rates, settle


class TestRegressionBaselines:
    def test_two_factor_within_two_se_of_reference(self):
        val_date, fwd, rates, settle = reg_market()
        vol_idx = pd.period_range(val_date, "2020-06-01", freq="D")
        factors = [
            (0.0, pd.Series(index=vol_idx, data=0.14)),
            (16.2, pd.Series(index=vol_idx.copy(), data=1.15)),
        ]
        progresses = []
        res = multi_factor_value(
            simple_reg_storage(), val_date, 0.0, fwd, rates, settle, factors, 0.64,
            4096, "1 + x0 + x0**2 + x1 + x1*x1", False, seed=11, fwd_sim_seed=11,
            dtype=F64, on_progress_update=progresses.append,
            sim_data_returned=SimulationDataReturned.ALL,
        )
        # Reference pinned-seed outputs (test_multi_factor.py:99-103); with an
        # independent RNG the acceptance is within 2 of the reference's MC
        # standard errors (its 500-sim pin carries that uncertainty itself);
        # 4096 sims keep OUR estimator noise from stacking on top.
        assert abs(res.npv - 1_780_380.7581833513) < 2 * 21_405.34
        assert res.val_sim_standard_error == pytest.approx(
            21_405.34 * (500 / 4096) ** 0.5, rel=0.25
        )
        assert res.intrinsic_npv == pytest.approx(1_703_773.0757192627, rel=2e-3)
        assert res.extrinsic_npv > 0
        assert progresses[-1] == 1.0
        assert res.sim_spot_regress.shape == (123, 4096)
        assert res.sim_inventory.shape == (123, 4096)
        assert res.sim_inject_withdraw.shape == (122, 4096)
        assert len(res.sim_factors_regress) == 2
        # Lower-bound property: forward NPV cannot exceed intrinsic + full
        # option value by pathology; sanity: NPV >= intrinsic - 2 SE.
        assert res.npv >= res.intrinsic_npv - 2 * res.val_sim_standard_error

    def test_three_factor_seasonal_within_two_se_of_reference(self):
        val_date, fwd, rates, settle = reg_market()
        res = three_factor_seasonal_value(
            simple_reg_storage(), val_date, 0.0, fwd, rates, settle,
            spot_mean_reversion=16.2, spot_vol=1.15, long_term_vol=0.14,
            seasonal_vol=0.18, num_sims=4096,
            basis_funcs="1 + x_st + x_sw + x_lt + x_st**2 + x_sw**2 + x_lt**2",
            discount_deltas=False, seed=11, fwd_sim_seed=11, dtype=F64,
        )
        # Reference: NPV 1,766,460.14, SE 18,459.70 (test_multi_factor.py:259-263);
        # acceptance within 2 of the reference's own SE (see the 2F test).
        assert abs(res.npv - 1_766_460.137569665) < 2 * 18_459.70
        assert res.val_sim_standard_error == pytest.approx(
            18_459.70 * (500 / 4096) ** 0.5, rel=0.25
        )


class TestValueFromSims:
    def test_reproduces_multi_factor_value_exactly(self):
        val_date, fwd, rates, settle = reg_market()
        vol_idx = pd.period_range(val_date, "2020-06-01", freq="D")
        factors = [
            (0.0, pd.Series(index=vol_idx, data=0.14)),
            (16.2, pd.Series(index=vol_idx.copy(), data=1.15)),
        ]
        res = multi_factor_value(
            simple_reg_storage(), val_date, 0.0, fwd, rates, settle, factors, 0.64,
            300, "1 + x0 + x0**2 + x1 + x1*x1", False, seed=11, fwd_sim_seed=11,
            dtype=F64, sim_data_returned=SimulationDataReturned.ALL,
        )
        res_from_sims = value_from_sims(
            simple_reg_storage(), val_date, 0.0, fwd, rates, settle,
            res.sim_spot_regress, res.sim_spot_valuation,
            "1 + x0 + x0**2 + x1 + x1*x1", False,
            sim_factors_regress=res.sim_factors_regress,
            sim_factors_valuation=res.sim_factors_valuation,
            dtype=F64,
        )
        assert res_from_sims.npv == pytest.approx(res.npv, rel=1e-12)
        pd.testing.assert_series_equal(res.deltas, res_from_sims.deltas)
        pd.testing.assert_frame_equal(res.expected_profile, res_from_sims.expected_profile)
        assert res_from_sims.intrinsic_npv == res.intrinsic_npv

    def test_missing_period_raises(self):
        val_date, fwd, rates, settle = reg_market()
        periods = pd.period_range("2019-12-01", "2020-03-30", freq="D")  # ends early
        frame = pd.DataFrame(np.full((len(periods), 8), 25.0), index=periods)
        with pytest.raises(ValueError, match="does not contain a row"):
            value_from_sims(
                simple_reg_storage(), val_date, 0.0, fwd, rates, settle,
                frame, frame, "1 + s", False, dtype=F64,
            )


class TestBehaviouralInvariants:
    def test_sim_data_flags_do_not_change_numbers(self):
        val_date, fwd, rates, settle = reg_market()
        vol_idx = pd.period_range(val_date, "2020-06-01", freq="D")
        factors = [(8.0, pd.Series(index=vol_idx, data=0.8))]
        kwargs = dict(seed=3, fwd_sim_seed=5, dtype=F64)
        res_all = multi_factor_value(
            simple_reg_storage(), val_date, 0.0, fwd, rates, settle, factors, None,
            200, "1 + x0 + x0**2", False,
            sim_data_returned=SimulationDataReturned.ALL, **kwargs,
        )
        res_none = multi_factor_value(
            simple_reg_storage(), val_date, 0.0, fwd, rates, settle, factors, None,
            200, "1 + x0 + x0**2", False,
            sim_data_returned=SimulationDataReturned.NONE, **kwargs,
        )
        assert res_all.npv == res_none.npv
        assert res_all.val_sim_standard_error == res_none.val_sim_standard_error
        pd.testing.assert_series_equal(res_all.deltas, res_none.deltas)
        assert len(res_none.sim_inventory) == 0
        assert len(res_none.sim_spot_regress) == 0
        assert res_all.sim_inventory.shape == (123, 200)

    def test_low_vol_lsmc_close_to_intrinsic(self):
        # Near-zero vol collapses LSMC onto the intrinsic value
        # (LsmcStorageValuationTest.cs:573-609, tol 0.01%).
        val_date, fwd, rates, settle = reg_market()
        vol_idx = pd.period_range(val_date, "2020-06-01", freq="D")
        factors = [(0.5, pd.Series(index=vol_idx, data=1e-5))]
        res = multi_factor_value(
            simple_reg_storage(), val_date, 0.0, fwd, rates, settle, factors, None,
            200, "1 + x0", False, seed=2, fwd_sim_seed=2, dtype=F64,
        )
        assert res.npv == pytest.approx(res.intrinsic_npv, rel=1e-4)

    def test_ad_deltas_match_pathwise_deltas(self):
        """Reverse-mode AD through the full valuation graph reproduces the
        hand-derived pathwise delta estimator (envelope theorem: the bang-bang
        argmax contributes zero gradient a.e.)."""
        import jax

        from storage_tpu.basis import parse_basis_functions
        from storage_tpu.engines import lsmc as lsmc_engine
        from storage_tpu.models import multi_factor as mf
        from storage_tpu.models.spot_sim import simulate_ou_paths
        from storage_tpu.parallel.mesh import sim_inputs_from_precompute
        from storage_tpu.valuation_inputs import prepare_valuation

        val_date, fwd, rates, settle = reg_market()
        storage = simple_reg_storage()
        inputs = prepare_valuation(storage, val_date, 0.0, fwd, rates, settle)
        vol_idx = pd.period_range(val_date, "2020-06-01", freq="D")
        pre = mf.simulation_precompute(
            [(8.0, pd.Series(index=vol_idx, data=0.7))], None, inputs.val_day,
            list(inputs.periods), "D",
        )
        sim_inputs = sim_inputs_from_precompute(pre, inputs.fwd, F64)
        monomials = tuple(parse_basis_functions("1 + x0 + x0**2 + s"))
        arrays = lsmc_engine.build_engine_arrays(
            inputs.compiled, inputs.fwd, inputs.df_settle, inputs.df_flow,
            inputs.inventory_lower, inputs.inventory_upper, 40, F64,
        )
        reg = simulate_ou_paths(
            jax.random.key(5), jnp.arange(400), sim_inputs["decay"],
            sim_inputs["chol"], sim_inputs["vols"], sim_inputs["half_var"],
            sim_inputs["fwd"],
        )
        val = simulate_ou_paths(
            jax.random.key(6), jnp.arange(400), sim_inputs["decay"],
            sim_inputs["chol"], sim_inputs["vols"], sim_inputs["half_var"],
            sim_inputs["fwd"],
        )
        pathwise = lsmc_engine.lsmc_core(
            arrays, reg.spot, reg.factors, val.spot, val.factors,
            jnp.asarray(0.0, F64), monomials, 0, False, None, False,
        )
        stoch_reg = reg.spot / arrays["fwd"][:, None]
        stoch_val = val.spot / arrays["fwd"][:, None]
        npv_ad, deltas_ad = lsmc_engine.lsmc_npv_and_ad_deltas(
            arrays, stoch_reg, reg.factors, stoch_val, val.factors,
            jnp.asarray(0.0, F64), monomials, 0, False, None, False,
        )
        assert float(npv_ad) == pytest.approx(float(pathwise["npv"]), rel=1e-12)
        n = arrays["fwd"].shape[0] - 1
        np.testing.assert_allclose(
            np.asarray(deltas_ad)[:n], np.asarray(pathwise["deltas"])[:n],
            rtol=1e-6, atol=1e-8,
        )

    def test_extra_decisions_weakly_improve_npv(self):
        val_date, fwd, rates, settle = reg_market()
        vol_idx = pd.period_range(val_date, "2020-06-01", freq="D")
        factors = [(8.0, pd.Series(index=vol_idx, data=0.6))]
        base = multi_factor_value(
            simple_reg_storage(), val_date, 0.0, fwd, rates, settle, factors, None,
            300, "1 + x0 + x0**2", False, seed=4, fwd_sim_seed=6, dtype=F64,
        )
        refined = multi_factor_value(
            simple_reg_storage(), val_date, 0.0, fwd, rates, settle, factors, None,
            300, "1 + x0 + x0**2", False, seed=4, fwd_sim_seed=6, dtype=F64,
            extra_decisions=1,
        )
        # Bang-bang is optimal for this facility, so extra decisions should not
        # change the value materially (and never degrade it beyond noise).
        assert refined.npv == pytest.approx(base.npv, rel=2e-3)
