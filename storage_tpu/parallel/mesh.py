"""Path-parallel LSMC over a device mesh.

The distributed dimension of the framework (the reference is strictly
single-process — SURVEY.md §2.2/§5.8): Monte Carlo paths are sharded across a
1-D ``jax.sharding.Mesh``; the only cross-shard communication is

* the per-step regression moments psum ([B,B] + [B,G], B ~ 10) inside the
  backward scan, and
* the final NPV / SE / delta / profile mean-reductions,

all wired through the engines' ``axis_name`` parameter.  Every shard solves
the same tiny [B,B] system redundantly — cheaper than sharding the solve.
Path identity is global (counter-based RNG keyed by global path id), so
results are invariant to the shard count; the tests pin this.

Simulation happens *inside* ``shard_map``: each shard draws only its own path
block, so the full path panel never exists unsharded.
"""
from __future__ import annotations

import typing as tp
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..basis import Monomial
from ..engines import lsmc as lsmc_engine
from ..models.multi_factor import SimulationPrecompute
from ..models.spot_sim import simulate_ou_paths

AXIS = "paths"


def make_mesh(num_devices: tp.Optional[int] = None, devices=None) -> Mesh:
    """1-D mesh over paths.  ``num_devices`` defaults to all local devices."""
    if devices is None:
        devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (AXIS,))


def pad_num_sims(num_sims: int, num_devices: int) -> int:
    """Round the path count up to a multiple of the mesh size."""
    return -(-num_sims // num_devices) * num_devices


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "s_local", "monomials", "num_extra_decisions", "discount_deltas",
        "terminal_fn", "ratchet_is_step", "antithetic", "same_sims",
        "return_sim_data", "use_pallas",
    ),
)
def _sharded_lsmc_jit(
    arrays,
    sim_inputs,
    reg_key,
    val_key,
    inv0,
    *,
    mesh: Mesh,
    s_local: int,
    monomials,
    num_extra_decisions: int,
    discount_deltas: bool,
    terminal_fn,
    ratchet_is_step: bool,
    antithetic: bool,
    same_sims: bool,
    return_sim_data: bool,
    use_pallas: bool,
):
    def shard_fn(arrays, sim_inputs, reg_key, val_key, inv0):
        shard = jax.lax.axis_index(AXIS)
        path_ids = shard * s_local + jnp.arange(s_local)
        reg = simulate_ou_paths(
            reg_key, path_ids, sim_inputs["decay"], sim_inputs["chol"],
            sim_inputs["vols"], sim_inputs["half_var"], sim_inputs["fwd"],
            antithetic=antithetic,
        )
        if same_sims:
            val = reg
        else:
            val = simulate_ou_paths(
                val_key, path_ids, sim_inputs["decay"], sim_inputs["chol"],
                sim_inputs["vols"], sim_inputs["half_var"], sim_inputs["fwd"],
                antithetic=antithetic,
            )
        return lsmc_engine.lsmc_core(
            arrays, reg.spot, reg.factors, val.spot, val.factors, inv0,
            monomials, num_extra_decisions, discount_deltas, terminal_fn,
            ratchet_is_step, axis_name=AXIS, return_sim_data=return_sim_data,
            use_pallas=use_pallas,
        )

    # Reduced outputs are identical on every shard; per-sim panels keep their
    # path shard.
    sharded_keys = {
        "sim_inventory", "sim_inject_withdraw", "sim_cmdty_consumed",
        "sim_inventory_loss", "sim_net_volume", "sim_pv",
    }
    result_keys = [
        "npv", "standard_error", "backward_npv", "deltas", "profile_inventory",
        "profile_inject_withdraw", "profile_cmdty_consumed",
        "profile_inventory_loss", "profile_pv", "trigger_inject_volumes",
        "trigger_inject_prices", "trigger_withdraw_volumes",
        "trigger_withdraw_prices", "max_inject_volume",
        "max_inject_trigger_price", "max_withdraw_volume",
        "max_withdraw_trigger_price",
    ]
    out_specs = {k: P() for k in result_keys}
    if return_sim_data:
        for k in sharded_keys:
            out_specs[k] = P(None, AXIS)

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P()),
        out_specs=out_specs,
        check_vma=False,
    )
    return mapped(arrays, sim_inputs, reg_key, val_key, inv0)


def sharded_lsmc_core(
    mesh: Mesh,
    arrays: tp.Dict[str, jnp.ndarray],
    sim_inputs: tp.Dict[str, jnp.ndarray],
    reg_key,
    val_key,
    num_sims: int,
    starting_inventory,
    monomials: tp.Tuple[Monomial, ...],
    num_extra_decisions: int,
    discount_deltas: bool,
    terminal_fn,
    ratchet_is_step: bool,
    antithetic: bool = False,
    same_sims: bool = False,
    return_sim_data: bool = False,
    use_pallas: tp.Optional[bool] = None,
):
    """LSMC with paths sharded over ``mesh``; returns the engine result dict
    with reduced outputs replicated and per-sim panels path-sharded.

    ``sim_inputs`` holds the OU simulation arrays (decay/chol/vols/half_var/fwd)
    from ``multi_factor.simulation_precompute``; ``same_sims`` reuses the
    regression paths for valuation (the pinned-seed regression-test setup).
    The underlying jit caches on (mesh, shapes, static config), so repeated
    valuations with fresh keys or curves do not recompile.
    """
    n_dev = mesh.devices.size
    if num_sims % n_dev != 0:
        raise ValueError(
            f"num_sims ({num_sims}) must be a multiple of the mesh size ({n_dev}); "
            f"use pad_num_sims."
        )
    s_local = num_sims // n_dev
    return _sharded_lsmc_jit(
        arrays, sim_inputs, reg_key, val_key,
        jnp.asarray(starting_inventory, arrays["grids"].dtype),
        mesh=mesh, s_local=s_local, monomials=monomials,
        num_extra_decisions=num_extra_decisions, discount_deltas=discount_deltas,
        terminal_fn=terminal_fn, ratchet_is_step=ratchet_is_step,
        antithetic=antithetic, same_sims=same_sims,
        return_sim_data=return_sim_data,
        use_pallas=lsmc_engine.resolve_use_pallas(
            use_pallas, s_local, arrays["grids"].dtype
        ),
    )


def sim_inputs_from_precompute(pre: SimulationPrecompute, fwd: np.ndarray, dtype):
    return {
        "decay": jnp.asarray(pre.decay, dtype),
        "chol": jnp.asarray(pre.chol, dtype),
        "vols": jnp.asarray(pre.vols, dtype),
        "half_var": jnp.asarray(pre.half_var, dtype),
        "fwd": jnp.asarray(fwd, dtype),
    }


@partial(
    jax.jit,
    static_argnames=(
        "mesh", "monomials", "num_extra_decisions", "discount_deltas",
        "terminal_fn", "ratchet_is_step", "return_sim_data", "use_pallas",
        "return_regression",
    ),
)
def _sharded_from_sims_jit(
    arrays, spot_reg, factors_reg, spot_val, factors_val, inv0,
    *, mesh, monomials, num_extra_decisions, discount_deltas, terminal_fn,
    ratchet_is_step, return_sim_data, use_pallas, return_regression=False,
):
    def shard_fn(arrays, spot_reg, factors_reg, spot_val, factors_val, inv0):
        return lsmc_engine.lsmc_core(
            arrays, spot_reg, factors_reg, spot_val, factors_val, inv0,
            monomials, num_extra_decisions, discount_deltas, terminal_fn,
            ratchet_is_step, axis_name=AXIS, return_sim_data=return_sim_data,
            use_pallas=use_pallas, return_regression=return_regression,
        )

    sharded_keys = {
        "sim_inventory", "sim_inject_withdraw", "sim_cmdty_consumed",
        "sim_inventory_loss", "sim_net_volume", "sim_pv",
    }
    result_keys = [
        "npv", "standard_error", "backward_npv", "deltas", "profile_inventory",
        "profile_inject_withdraw", "profile_cmdty_consumed",
        "profile_inventory_loss", "profile_pv", "trigger_inject_volumes",
        "trigger_inject_prices", "trigger_withdraw_volumes",
        "trigger_withdraw_prices", "max_inject_volume",
        "max_inject_trigger_price", "max_withdraw_volume",
        "max_withdraw_trigger_price",
    ]
    out_specs = {k: P() for k in result_keys}
    if return_sim_data:
        for k in sharded_keys:
            out_specs[k] = P(None, AXIS)
    if return_regression:
        # Identical on every shard after the moments psum.
        for k in ("regression_mean", "regression_std", "regression_coeffs"):
            out_specs[k] = P()

    mapped = jax.shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(
            P(), P(None, AXIS), P(None, None, AXIS), P(None, AXIS),
            P(None, None, AXIS), P(),
        ),
        out_specs=out_specs,
        check_vma=False,
    )
    return mapped(arrays, spot_reg, factors_reg, spot_val, factors_val, inv0)


def lsmc_core_from_sims(
    arrays: tp.Dict[str, jnp.ndarray],
    spot_reg, factors_reg, spot_val, factors_val,
    starting_inventory,
    monomials: tp.Tuple[Monomial, ...],
    num_extra_decisions: int,
    discount_deltas: bool,
    terminal_fn,
    ratchet_is_step: bool,
    return_sim_data: bool = False,
    use_pallas: tp.Optional[bool] = None,
    mesh: tp.Optional[Mesh] = None,
    return_regression: bool = False,
):
    """LSMC over pre-simulated path panels ([N+1, S] / [N+1, F, S]), sharding
    the sim axis across all local devices when possible (the distributed analog
    of the reference's user-supplied-sims path, SpotSimResultsFromPanels.cs:36-117).

    Falls back to single-device execution when only one device is present or
    the sim count does not divide the mesh; results are invariant to that
    choice up to f32 reduction-order noise.  ``return_regression`` adds the
    per-step regression payload (replicated) to the result for checkpointing.
    """
    num_sims = spot_reg.shape[1]
    multiprocess = jax.process_count() > 1
    if mesh is None:
        devices = jax.devices()
        if len(devices) > 1 and num_sims % len(devices) == 0:
            mesh = make_mesh()
    inv0 = jnp.asarray(starting_inventory, arrays["grids"].dtype)
    if multiprocess:
        # Host-replicated inputs must become global arrays to feed a jit that
        # spans processes; sim panels are expected to be globally sharded
        # already (distributed.host_local_sims_to_global).
        from . import distributed as dist

        if mesh is None:
            mesh = dist.global_mesh()
        if return_sim_data:
            raise ValueError(
                "Per-sim panels are not available in multi-process runs: each "
                "process only holds its own path shard. Use "
                "sim_data_returned=SimulationDataReturned.NONE."
            )
        arrays, inv0 = dist.replicate_to_global((arrays, inv0), mesh)
    if mesh is None or mesh.devices.size == 1 or num_sims % mesh.devices.size != 0:
        return lsmc_engine.lsmc_core(
            arrays, spot_reg, factors_reg, spot_val, factors_val, inv0,
            monomials, num_extra_decisions, discount_deltas, terminal_fn,
            ratchet_is_step, axis_name=None, return_sim_data=return_sim_data,
            use_pallas=lsmc_engine.resolve_use_pallas(
                use_pallas, num_sims, arrays["grids"].dtype
            ),
            return_regression=return_regression,
        )
    s_local = num_sims // mesh.devices.size
    return _sharded_from_sims_jit(
        arrays, spot_reg, factors_reg, spot_val, factors_val, inv0,
        mesh=mesh, monomials=monomials,
        num_extra_decisions=num_extra_decisions, discount_deltas=discount_deltas,
        terminal_fn=terminal_fn, ratchet_is_step=ratchet_is_step,
        return_sim_data=return_sim_data,
        use_pallas=lsmc_engine.resolve_use_pallas(
            use_pallas, s_local, arrays["grids"].dtype
        ),
        return_regression=return_regression,
    )
