"""Checkpoint / forward-only resume tests (SURVEY.md §5.4: the saved
regression coefficients are the natural checkpoint artifact)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd
import pytest

from storage_tpu import CmdtyStorage
from storage_tpu.basis import parse_basis_functions
from storage_tpu.checkpoint import (
    RegressionCheckpoint,
    revalue_from_checkpoint,
    run_backward_to_checkpoint,
)
from storage_tpu.engines import lsmc as lsmc_engine
from storage_tpu.models import multi_factor as mf
from storage_tpu.models.spot_sim import simulate_ou_paths
from storage_tpu.parallel.mesh import sim_inputs_from_precompute
from storage_tpu.valuation_inputs import prepare_valuation

F64 = jnp.float64


@pytest.fixture(scope="module")
def case():
    storage = CmdtyStorage(
        "D", "2021-01-01", "2021-03-01", 0.9, 0.7,
        min_inventory=0.0, max_inventory=5_000.0,
        max_injection_rate=300.0, max_withdrawal_rate=300.0,
    )
    idx = pd.period_range("2021-01-01", storage.end, freq="D")
    i = np.arange(len(idx))
    fwd = pd.Series(index=idx, data=30.0 + 6 * np.sin(2 * np.pi * i / 30.0))
    inputs = prepare_valuation(storage, "2021-01-01", 100.0, fwd, 0.02, None)
    vol_idx = pd.period_range("2021-01-01", storage.end, freq="D")
    pre = mf.simulation_precompute(
        [(10.0, pd.Series(index=vol_idx, data=0.8))], None, inputs.val_day,
        list(inputs.periods), "D",
    )
    arrays = lsmc_engine.build_engine_arrays(
        inputs.compiled, inputs.fwd, inputs.df_settle, inputs.df_flow,
        inputs.inventory_lower, inputs.inventory_upper, 30, F64,
    )
    sim_inputs = sim_inputs_from_precompute(pre, inputs.fwd, F64)

    def sims(key, n=300):
        return simulate_ou_paths(
            key, jnp.arange(n), sim_inputs["decay"], sim_inputs["chol"],
            sim_inputs["vols"], sim_inputs["half_var"], sim_inputs["fwd"],
        )

    return inputs, arrays, sims


class TestCheckpoint:
    def test_forward_only_resume_matches_full_run(self, case):
        inputs, arrays, sims = case
        reg, val = sims(jax.random.key(1)), sims(jax.random.key(2))
        monomials = tuple(parse_basis_functions("1 + x0 + x0**2 + s"))
        full = lsmc_engine.lsmc_core(
            arrays, reg.spot, reg.factors, val.spot, val.factors,
            jnp.asarray(100.0, F64), monomials, 0, False, None, False,
        )
        ckpt = run_backward_to_checkpoint(
            arrays, reg.spot, reg.factors, "1 + x0 + x0**2 + s", 100.0
        )
        resumed = revalue_from_checkpoint(ckpt, val.spot, val.factors, dtype=F64)
        assert float(resumed["npv"]) == pytest.approx(float(full["npv"]), rel=1e-12)
        np.testing.assert_allclose(
            np.asarray(resumed["deltas"]), np.asarray(full["deltas"]), rtol=1e-10
        )

    def test_save_load_roundtrip(self, case, tmp_path):
        inputs, arrays, sims = case
        reg, val = sims(jax.random.key(1)), sims(jax.random.key(2))
        ckpt = run_backward_to_checkpoint(
            arrays, reg.spot, reg.factors, "1 + x0 + x0**2 + s", 100.0
        )
        path = os.path.join(tmp_path, "ckpt.npz")
        ckpt.save(path)
        loaded = RegressionCheckpoint.load(path)
        assert loaded.basis_funcs == ckpt.basis_funcs
        assert loaded.starting_inventory == 100.0
        r1 = revalue_from_checkpoint(ckpt, val.spot, val.factors, dtype=F64)
        r2 = revalue_from_checkpoint(loaded, val.spot, val.factors, dtype=F64)
        assert float(r1["npv"]) == float(r2["npv"])

    def test_reprice_with_new_scenario_paths(self, case):
        # The point of the artifact: price fresh scenarios without the backward pass.
        inputs, arrays, sims = case
        reg = sims(jax.random.key(1))
        ckpt = run_backward_to_checkpoint(
            arrays, reg.spot, reg.factors, "1 + x0 + x0**2 + s", 100.0
        )
        npvs = []
        for seed in (10, 20):
            val = sims(jax.random.key(seed))
            r = revalue_from_checkpoint(ckpt, val.spot, val.factors, dtype=F64)
            npvs.append(float(r["npv"]))
        assert npvs[0] != npvs[1]
        # Both are valid estimates of the same value: agree within joint MC error.
        assert abs(npvs[0] - npvs[1]) < 6 * float(
            revalue_from_checkpoint(
                ckpt, sims(jax.random.key(10)).spot, sims(jax.random.key(10)).factors,
                dtype=F64,
            )["standard_error"]
        )

    def test_terminal_fn_required_when_not_empty(self, case):
        inputs, arrays, sims = case
        reg = sims(jax.random.key(1))
        monomials_str = "1 + x0"
        ckpt = run_backward_to_checkpoint(
            arrays, reg.spot, reg.factors, monomials_str, 100.0,
            terminal_fn=lambda p, i: p * i,
        )
        val = sims(jax.random.key(2))
        with pytest.raises(ValueError, match="terminal_fn"):
            revalue_from_checkpoint(ckpt, val.spot, val.factors, dtype=F64)
