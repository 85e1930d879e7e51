"""Multi-factor model and OU simulator tests.

Model identities modelled on ``test_multi_factor_diffusion_model.py:45-74``;
the simulator is validated against the model's closed-form moments (exact
bit-match to the reference's Mersenne-Twister draws is impossible by design —
acceptance is distributional, cf. SURVEY.md §7.3).
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from storage_tpu.models import multi_factor as mf
from storage_tpu.models.spot_sim import MultiFactorSpotSim, simulate_ou_paths


def daily_curve(start, end, value):
    idx = pd.period_range(start, end, freq="D")
    return pd.Series(index=idx, data=float(value))


class TestModelIdentities:
    def test_single_non_reverting_factor_implied_vol_equals_factor_vol(self):
        vol = 0.31
        curve = daily_curve("2021-01-01", "2022-01-01", vol)
        model = mf.MultiFactorModel("D", [(0.0, curve)], None)
        implied = model.integrated_vol("2021-01-01", "2021-07-01", "2021-09-01")
        assert implied == pytest.approx(vol, rel=1e-12)

    def test_single_factor_correlations_all_one(self):
        curve = daily_curve("2021-01-01", "2022-01-01", 0.4)
        model = mf.MultiFactorModel("D", [(1.5, curve)], None)
        corr = model.integrated_corr("2021-01-01", "2021-03-01", "2021-06-01", "2021-08-01")
        assert corr == pytest.approx(1.0)

    def test_mean_reversion_dampens_variance(self):
        curve = daily_curve("2021-01-01", "2022-01-01", 0.4)
        no_mr = mf.MultiFactorModel("D", [(0.0, curve)], None)
        with_mr = mf.MultiFactorModel("D", [(8.0, curve)], None)
        v0 = no_mr.integrated_variance("2021-01-01", "2021-06-01", "2021-06-01")
        v1 = with_mr.integrated_variance("2021-01-01", "2021-06-01", "2021-06-01")
        assert v1 < v0

    def test_two_factor_covariance_formula(self):
        # Hand-computed: both factors non-reverting with constant vols —
        # covariance = rho * vol1 * vol2 * t.
        vol1, vol2, rho, t_days = 0.3, 0.2, 0.64, 100
        c1 = daily_curve("2021-01-01", "2022-01-01", vol1)
        c2 = daily_curve("2021-01-01", "2022-01-01", vol2)
        model = mf.MultiFactorModel("D", [(0.0, c1), (0.0, c2)], rho)
        obs_end = pd.Period("2021-01-01", freq="D") + t_days
        cov = model.integrated_covar("2021-01-01", obs_end, "2021-08-01", "2021-08-01")
        t = t_days / 365.0
        expected = vol1**2 * t + vol2**2 * t + 2 * rho * vol1 * vol2 * t
        assert cov == pytest.approx(expected, rel=1e-12)

    def test_mean_reverting_variance_closed_form(self):
        vol, mr, t_days = 0.8, 5.0, 200
        curve = daily_curve("2021-01-01", "2022-01-01", vol)
        model = mf.MultiFactorModel("D", [(mr, curve)], None)
        expiry = pd.Period("2021-01-01", freq="D") + t_days
        t = t_days / 365.0
        # Var of log F(t, T) with T = t: vol^2 * (1 - exp(-2 mr t)) / (2 mr)
        expected = vol**2 * (1 - math.exp(-2 * mr * t)) / (2 * mr)
        var = model.integrated_variance("2021-01-01", expiry, expiry)
        assert var == pytest.approx(expected, rel=1e-12)

    def test_validation(self):
        curve = daily_curve("2021-01-01", "2022-01-01", 0.3)
        with pytest.raises(ValueError, match="square"):
            mf.validate_multi_factor_params([(0.0, curve)], np.ones((1, 2)))
        with pytest.raises(ValueError, match="symmetric"):
            mf.validate_multi_factor_params(
                [(0.0, curve), (0.0, curve)], np.array([[1.0, 0.5], [0.2, 1.0]])
            )
        with pytest.raises(ValueError, match="diagonal"):
            mf.validate_multi_factor_params(
                [(0.0, curve), (0.0, curve)], np.array([[0.9, 0.5], [0.5, 1.0]])
            )
        with pytest.raises(ValueError, match="Mean reversion"):
            mf.validate_multi_factor_params([(-0.1, curve)], None)
        with pytest.raises(ValueError, match="scalar"):
            mf.validate_multi_factor_params([(0.0, curve)], 0.5)

    def test_three_factor_seasonal_peak_vol_feb1(self):
        factors, corrs = mf.create_3_factor_seasonal_params(
            "D", 16.0, 1.1, 0.2, 0.4, "2021-01-01", "2021-12-31"
        )
        seasonal_curve = factors[2][1]
        np.testing.assert_allclose(corrs, np.eye(3))
        # Seasonal vol peaks (amplitude seasonal/2) on Feb 1.
        assert seasonal_curve[pd.Period("2021-02-01", freq="D")] == pytest.approx(0.2)
        # Half a year later it is close to the trough.
        assert seasonal_curve[pd.Period("2021-08-01", freq="D")] == pytest.approx(-0.2, abs=1e-3)


class TestSimulatorMoments:
    def make_sim(self, num_sims, antithetic=False, seed=7):
        factors = [
            (0.0, daily_curve("2021-01-01", "2021-07-01", 0.2)),
            (6.0, daily_curve("2021-01-01", "2021-07-01", 0.9)),
        ]
        periods = pd.period_range("2021-02-01", "2021-06-01", freq="D")
        fwd = pd.Series(index=periods, data=np.linspace(40.0, 60.0, len(periods)))
        sim = MultiFactorSpotSim(
            "D", factors, 0.3, "2021-01-01", fwd, list(periods), seed=seed,
            antithetic=antithetic, dtype=jnp.float64,
        )
        return sim, fwd, factors

    def test_spot_mean_matches_forward(self):
        sim, fwd, _ = self.make_sim(20_000)
        frame = sim.simulate(20_000)
        rel_err = np.abs(frame.mean(axis=1).to_numpy() / fwd.to_numpy() - 1.0)
        # Martingale property: E[S_T] = F(0,T) within MC error.
        assert rel_err.max() < 0.02

    def test_log_spot_variance_matches_model(self):
        sim, fwd, factors = self.make_sim(20_000)
        frame = sim.simulate(20_000)
        model = mf.MultiFactorModel("D", factors, 0.3)
        for period in [pd.Period("2021-03-01", freq="D"), pd.Period("2021-06-01", freq="D")]:
            sample_var = np.var(np.log(frame.loc[period].to_numpy()))
            model_var = model.integrated_variance("2021-01-01", period, period)
            assert sample_var == pytest.approx(model_var, rel=0.05)

    def test_seed_reproducible(self):
        sim1, _, _ = self.make_sim(64, seed=123)
        sim2, _, _ = self.make_sim(64, seed=123)
        pd.testing.assert_frame_equal(sim1.simulate(64), sim2.simulate(64))

    def test_different_seeds_differ(self):
        sim1, _, _ = self.make_sim(64, seed=123)
        sim2, _, _ = self.make_sim(64, seed=124)
        assert not sim1.simulate(64).equals(sim2.simulate(64))

    def test_antithetic_pairs(self):
        sim, fwd, _ = self.make_sim(64, antithetic=True)
        spot, factor_frames = sim.simulate_with_factors(64)
        x = factor_frames[0].to_numpy()
        # Factor paths of even/odd sims are exact mirrors.
        np.testing.assert_allclose(x[:, 0::2], -x[:, 1::2], atol=1e-12)

    def test_path_subset_invariance(self):
        """Path id fixes the path: simulating sims [0..63] and a shard holding
        ids [32..63] produce identical paths — the property that makes results
        shard-count invariant."""
        sim, _, _ = self.make_sim(64)
        full = simulate_ou_paths(
            sim._key, jnp.arange(64), sim._decay, sim._chol, sim._vols,
            sim._half_var, sim._fwd,
        )
        shard = simulate_ou_paths(
            sim._key, jnp.arange(32, 64), sim._decay, sim._chol, sim._vols,
            sim._half_var, sim._fwd,
        )
        np.testing.assert_allclose(
            np.asarray(full.spot[:, 32:]), np.asarray(shard.spot), rtol=1e-12
        )

    def test_deterministic_at_time_zero(self):
        # Simulating the valuation period itself (dt=0) returns the forward price.
        factors = [(0.0, daily_curve("2021-01-01", "2021-03-01", 0.2))]
        periods = pd.period_range("2021-01-01", "2021-02-01", freq="D")
        fwd = pd.Series(index=periods, data=50.0)
        sim = MultiFactorSpotSim(
            "D", factors, None, "2021-01-01", fwd, list(periods), seed=1, dtype=jnp.float64
        )
        frame = sim.simulate(16)
        np.testing.assert_allclose(frame.loc[pd.Period("2021-01-01", freq="D")], 50.0)
