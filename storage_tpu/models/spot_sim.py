"""Exact-step multi-factor OU spot price simulation on device.

Replaces the reference's CPU Mersenne-Twister simulator
(``Cmdty.Core.Simulation.MultiFactor.MultiFactorSpotPriceSimulator``, consumed
at LsmcValuationParameters.cs:179-181) with a counter-based design: every path
derives its own threefry key from (base_key, global_path_id), so simulations
are bit-identical for any shard count or device layout — the property the
shard-invariance tests pin down.  OU transitions use the exact discrete-step
covariance (no Euler error), precomputed on host in float64
(``multi_factor.simulation_precompute``).
"""
from __future__ import annotations

import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from . import multi_factor as mf
from ..utils import periods as pu


class SpotSimResults(tp.NamedTuple):
    """Device-side simulation output: analog of ``ISpotSimResults``
    (surface per SpotSimResultsFromPanels.cs:77-109)."""

    spot: jnp.ndarray  # [P, S]
    factors: jnp.ndarray  # [P, F, S]

    @property
    def num_sims(self) -> int:
        return self.spot.shape[1]

    @property
    def num_steps(self) -> int:
        return self.spot.shape[0]

    @property
    def num_factors(self) -> int:
        return self.factors.shape[1]


def step_normals(
    key: jax.Array,
    step: jnp.ndarray,  # scalar int step index
    path_ids: jnp.ndarray,  # [S] global path indices
    num_factors: int,
    antithetic: bool,
    dtype,
) -> jnp.ndarray:
    """Standard-normal draws z[t] for one step, [S, F].

    The RNG identity is (base_key, step, path): one fold_in per step (hoisted
    out of the path vmap) plus one per path.  This layout is what makes both
    shard-count invariance AND in-scan regeneration possible — any step's
    draws can be recomputed in isolation, so the valuation scans never need
    the full [P, S, F] panel in memory (VERDICT r02 item 1)."""
    step_key = jax.random.fold_in(key, step)
    if antithetic:
        base = path_ids // 2
        sign = jnp.where(path_ids % 2 == 0, 1.0, -1.0).astype(dtype)
        z = jax.vmap(
            lambda pid: jax.random.normal(
                jax.random.fold_in(step_key, pid), (num_factors,), dtype=dtype
            )
        )(base)
        return z * sign[:, None]
    return jax.vmap(
        lambda pid: jax.random.normal(
            jax.random.fold_in(step_key, pid), (num_factors,), dtype=dtype
        )
    )(path_ids)


def ou_step(x, z, decay_k, chol_k):
    """One exact OU transition: x_k = decay_k ⊙ x_{k-1} + z_k Lᵀ_k ([S, F])."""
    return x * decay_k + jnp.dot(z, chol_k.T, preferred_element_type=x.dtype)


def spot_from_state(x, fwd_k, half_var_k, vols_k):
    """ln S_k = ln F_k − half_var_k + x·vols_k, per path ([S, F] → [S])."""
    return jnp.exp(
        jnp.log(fwd_k) - half_var_k
        + jnp.dot(x, vols_k, preferred_element_type=x.dtype)
    )


@partial(jax.jit, static_argnames=("antithetic",))
def simulate_ou_paths(
    key: jax.Array,
    path_ids: jnp.ndarray,  # [S] global path indices (shard-invariant RNG identity)
    decay: jnp.ndarray,  # [P, F]
    chol: jnp.ndarray,  # [P, F, F]
    vols: jnp.ndarray,  # [P, F]
    half_var: jnp.ndarray,  # [P]
    fwd: jnp.ndarray,  # [P]
    antithetic: bool = False,
) -> SpotSimResults:
    """Simulate factor states and spot prices for the given paths.

    x_i(t_k) = decay[k,i]·x_i(t_{k-1}) + (L_k z_k)_i with z_k ~ N(0, I);
    ln S_k = ln F_k − half_var[k] + Σ_i vols[k,i]·x_i(t_k).

    Draws come from ``step_normals`` inside the scan (per-step keying), so the
    [P, S, F] normals panel never materialises and the streamed valuation
    scans (engines/lsmc.py) regenerate bit-identical paths."""
    p, f = decay.shape
    dtype = decay.dtype

    def step(x, inputs):
        k, decay_k, chol_k, fwd_k, half_var_k, vols_k = inputs
        z_k = step_normals(key, k, path_ids, f, antithetic, dtype)
        x_new = ou_step(x, z_k, decay_k, chol_k)
        return x_new, (spot_from_state(x_new, fwd_k, half_var_k, vols_k), x_new)

    s = path_ids.shape[0]
    x0 = jnp.zeros((s, f), dtype=dtype)
    _, (spot, xs) = jax.lax.scan(
        step, x0, (jnp.arange(p), decay, chol, fwd, half_var, vols)
    )  # [P, S], [P, S, F]
    return SpotSimResults(spot=spot, factors=jnp.moveaxis(xs, 2, 1))


class MultiFactorSpotSim:
    """Pythonic simulator facade, mirroring the reference ``MultiFactorSpotSim``
    (multi_factor_spot_sim.py:39-88): constructed from factors + correlations +
    forward curve + periods to simulate; ``simulate(num_sims)`` returns a
    DataFrame of spot prices [periods x sims].

    The RNG is threefry counter-based rather than Mersenne-Twister, so pinned
    seeds are reproducible within this framework but (necessarily) not
    bit-matched to the reference — accuracy acceptance is statistical.
    """

    def __init__(
        self,
        freq: str,
        factors: tp.Collection[mf.FactorType],
        factor_corrs: mf.FactorCorrsType,
        current_date,
        fwd_curve: tp.Union[pd.Series, tp.Dict],
        sim_periods: tp.Iterable,
        seed: tp.Optional[int] = None,
        antithetic: bool = False,
        dtype=jnp.float32,
    ):
        pandas_freq = pu.normalise_freq(freq)
        self._freq = pandas_freq
        periods = [
            p if isinstance(p, pd.Period) else pd.Period(p, freq=pandas_freq)
            for p in sim_periods
        ]
        self._periods = periods
        pre = mf.simulation_precompute(factors, factor_corrs, current_date, periods, freq)
        if isinstance(fwd_curve, pd.Series):
            fwd_vals = []
            curve = fwd_curve.copy()
            if not isinstance(curve.index, pd.PeriodIndex):
                curve.index = pd.PeriodIndex(curve.index, freq=pandas_freq)
            for p in periods:
                if p not in curve.index:
                    raise ValueError(f"Forward curve has no point for period {p}.")
                fwd_vals.append(float(curve[p]))
        else:
            lookup = {
                (k if isinstance(k, pd.Period) else pd.Period(k, freq=pandas_freq)): float(v)
                for k, v in fwd_curve.items()
            }
            fwd_vals = []
            for p in periods:
                if p not in lookup:
                    raise ValueError(f"Forward curve has no point for period {p}.")
                fwd_vals.append(lookup[p])
        self._dtype = dtype
        self._decay = jnp.asarray(pre.decay, dtype)
        self._chol = jnp.asarray(pre.chol, dtype)
        self._vols = jnp.asarray(pre.vols, dtype)
        self._half_var = jnp.asarray(pre.half_var, dtype)
        self._fwd = jnp.asarray(np.array(fwd_vals), dtype)
        self._key = jax.random.key(0 if seed is None else int(seed))
        self._antithetic = antithetic

    def simulate(self, num_sims: int) -> pd.DataFrame:
        res = simulate_ou_paths(
            self._key,
            jnp.arange(num_sims),
            self._decay,
            self._chol,
            self._vols,
            self._half_var,
            self._fwd,
            antithetic=self._antithetic,
        )
        return pd.DataFrame(
            data=np.asarray(res.spot),
            index=pd.PeriodIndex(self._periods, freq=self._freq),
        )

    def simulate_with_factors(self, num_sims: int) -> tp.Tuple[pd.DataFrame, tp.List[pd.DataFrame]]:
        """Spot frame plus one frame per Markov factor (for ``value_from_sims``)."""
        res = simulate_ou_paths(
            self._key,
            jnp.arange(num_sims),
            self._decay,
            self._chol,
            self._vols,
            self._half_var,
            self._fwd,
            antithetic=self._antithetic,
        )
        index = pd.PeriodIndex(self._periods, freq=self._freq)
        spot = pd.DataFrame(data=np.asarray(res.spot), index=index)
        factors = [
            pd.DataFrame(data=np.asarray(res.factors[:, i, :]), index=index.copy())
            for i in range(res.num_factors)
        ]
        return spot, factors
