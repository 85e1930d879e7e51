"""Checkpoint / resume for LSMC valuations.

The reference keeps the per-period regression coefficients as the hand-off
between the backward induction and the forward pass
(``regressCoeffsBuilder``, LsmcStorageValuation.cs:159,212,360) but discards
them afterwards.  Here they are a first-class artifact: a
``RegressionCheckpoint`` captures everything the forward pass needs, so a
valuation can be

* persisted and resumed (e.g. after preemption of a long multi-facility batch),
* re-priced forward-only against fresh valuation paths (new seed, more sims, or
  user-supplied scenarios) without re-running the backward induction — the
  dual-simulation design makes this statistically sound, and

the checkpoint doubles as an audit record of the fitted continuation model.
"""
from __future__ import annotations

import dataclasses
import json
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

from .basis import Monomial, parse_basis_functions
from .engines import lsmc as lsmc_engine


# Module-level jit so repeated revaluations share the compilation cache.
_forward_jit = jax.jit(
    lsmc_engine.lsmc_forward,
    static_argnames=(
        "monomials", "num_extra_decisions", "discount_deltas", "terminal_fn",
        "ratchet_is_step", "axis_name", "return_sim_data",
    ),
)


@dataclasses.dataclass(frozen=True, eq=False)
class RegressionCheckpoint:
    """Everything needed to run (only) the forward pass of an LSMC valuation."""

    arrays: tp.Dict[str, np.ndarray]  # engine arrays (grids, curves, costs, ...)
    regression: tp.Dict[str, np.ndarray]  # mean [N,B], std [N,B], coeffs [N,B,G]
    basis_funcs: str
    starting_inventory: float
    num_extra_decisions: int
    discount_deltas: bool
    ratchet_is_step: bool
    must_be_empty_at_end: bool

    @property
    def monomials(self) -> tp.Tuple[Monomial, ...]:
        return tuple(parse_basis_functions(self.basis_funcs))

    def save(self, path: str) -> None:
        meta = {
            "basis_funcs": self.basis_funcs,
            "starting_inventory": self.starting_inventory,
            "num_extra_decisions": self.num_extra_decisions,
            "discount_deltas": self.discount_deltas,
            "ratchet_is_step": self.ratchet_is_step,
            "must_be_empty_at_end": self.must_be_empty_at_end,
        }
        payload = {f"arrays.{k}": np.asarray(v) for k, v in self.arrays.items()}
        payload.update({f"regression.{k}": np.asarray(v) for k, v in self.regression.items()})
        payload["meta_json"] = np.frombuffer(
            json.dumps(meta).encode("utf-8"), dtype=np.uint8
        )
        np.savez_compressed(path, **payload)

    @staticmethod
    def load(path: str) -> "RegressionCheckpoint":
        with np.load(path) as data:
            meta = json.loads(bytes(data["meta_json"]).decode("utf-8"))
            arrays = {
                k.split(".", 1)[1]: data[k] for k in data.files if k.startswith("arrays.")
            }
            regression = {
                k.split(".", 1)[1]: data[k]
                for k in data.files
                if k.startswith("regression.")
            }
        return RegressionCheckpoint(arrays=arrays, regression=regression, **meta)


def make_checkpoint(
    arrays: tp.Dict[str, jnp.ndarray],
    regression: tp.Dict[str, jnp.ndarray],
    basis_funcs: str,
    starting_inventory: float,
    num_extra_decisions: int,
    discount_deltas: bool,
    ratchet_is_step: bool,
    must_be_empty_at_end: bool,
) -> RegressionCheckpoint:
    return RegressionCheckpoint(
        arrays={k: np.asarray(v) for k, v in arrays.items()},
        regression={k: np.asarray(v) for k, v in regression.items()},
        basis_funcs=basis_funcs,
        starting_inventory=float(starting_inventory),
        num_extra_decisions=int(num_extra_decisions),
        discount_deltas=bool(discount_deltas),
        ratchet_is_step=bool(ratchet_is_step),
        must_be_empty_at_end=bool(must_be_empty_at_end),
    )


def run_backward_to_checkpoint(
    arrays,
    spot_reg,
    factors_reg,
    basis_funcs: str,
    starting_inventory: float,
    num_extra_decisions: int = 0,
    discount_deltas: bool = False,
    terminal_fn=None,
    ratchet_is_step: bool = False,
    axis_name=None,
) -> RegressionCheckpoint:
    """Backward induction only, returning the persistent checkpoint."""
    monomials = tuple(parse_basis_functions(basis_funcs))
    _, regression = lsmc_engine.lsmc_backward(
        arrays, spot_reg, factors_reg, monomials, num_extra_decisions,
        terminal_fn, ratchet_is_step, axis_name,
    )
    return make_checkpoint(
        arrays, regression, basis_funcs, starting_inventory,
        num_extra_decisions, discount_deltas, ratchet_is_step,
        must_be_empty_at_end=terminal_fn is None,
    )


def revalue_from_checkpoint(
    checkpoint: RegressionCheckpoint,
    spot_val,
    factors_val,
    terminal_fn=None,
    axis_name=None,
    return_sim_data: bool = False,
    dtype=None,
):
    """Forward-only re-pricing from a checkpoint against new valuation paths.

    ``terminal_fn`` must be re-supplied for non-empty-at-end storage
    (callables do not persist)."""
    if checkpoint.must_be_empty_at_end:
        terminal_fn = None
    elif terminal_fn is None:
        raise ValueError(
            "Checkpoint was created for storage with a terminal value; pass terminal_fn."
        )
    dtype = dtype or jnp.asarray(spot_val).dtype
    arrays = {k: jnp.asarray(v, dtype) for k, v in checkpoint.arrays.items()}
    regression = {k: jnp.asarray(v, dtype) for k, v in checkpoint.regression.items()}

    return _forward_jit(
        arrays, jnp.asarray(spot_val, dtype), jnp.asarray(factors_val, dtype),
        regression, jnp.asarray(checkpoint.starting_inventory, dtype),
        monomials=checkpoint.monomials,
        num_extra_decisions=checkpoint.num_extra_decisions,
        discount_deltas=checkpoint.discount_deltas, terminal_fn=terminal_fn,
        ratchet_is_step=checkpoint.ratchet_is_step, axis_name=axis_name,
        return_sim_data=return_sim_data,
    )
