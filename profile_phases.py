"""Phase-split profiling of the bench config on real hardware (dev tool)."""
import time
import jax

try:  # share bench.py's persistent compile cache (cold start is minutes)
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:
    pass
import jax.numpy as jnp
from functools import partial

from __graft_entry__ import _build_case
from storage_tpu.engines import lsmc as lsmc_engine
from storage_tpu.models.spot_sim import simulate_ou_paths

NUM_SIMS = 262_144
NUM_STEPS = 365
NUM_GRID = 100

dtype = jnp.float32
inputs, arrays, sim_inputs, monomials = _build_case(
    num_steps=NUM_STEPS, num_grid=NUM_GRID, num_sims=NUM_SIMS, dtype=dtype
)
terminal_fn = inputs.compiled.terminal_value
inv0 = jnp.asarray(inputs.starting_inventory, dtype)
path_ids = jnp.arange(NUM_SIMS)


@jax.jit
def sim_only(key):
    return simulate_ou_paths(
        key, path_ids, sim_inputs["decay"], sim_inputs["chol"],
        sim_inputs["vols"], sim_inputs["half_var"], sim_inputs["fwd"],
        antithetic=False,
    )


USE_PALLAS = lsmc_engine.resolve_use_pallas(None, NUM_SIMS, dtype)


@partial(jax.jit, static_argnames=())
def backward_only(spot, factors):
    v0, reg = lsmc_engine.lsmc_backward(
        arrays, spot, factors, monomials, 0, terminal_fn, False, None,
        use_pallas=USE_PALLAS,
    )
    return v0.sum(), jax.tree.map(lambda x: x, reg)


@jax.jit
def forward_only(spot, factors, regression):
    return lsmc_engine.lsmc_forward(
        arrays, spot, factors, regression, inv0, monomials, 0, False,
        terminal_fn, False, None, False, use_pallas=USE_PALLAS,
    )["npv"]


def _force(out):
    """Force a host transfer of one scalar per array leaf: on tunneled TPU
    backends jax.block_until_ready returns at dispatch time, so timing must
    read a value back."""
    for leaf in jax.tree.leaves(out):
        if leaf.size:
            # Index one element directly: jnp.ravel on a [P, F, S] panel
            # forces a full device relayout copy (~40 ms at the bench config)
            # and inflated the round-3 sim-phase numbers (112 vs ~52 ms/set).
            float(leaf[(0,) * leaf.ndim])
    return out


def bench(fn, *args, n=3):
    out = _force(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        _force(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts), out


t_sim, reg_paths = bench(sim_only, jax.random.key(11))
print(f"simulate one path set: {t_sim*1e3:9.1f} ms")

t_bwd, (_, regression) = bench(backward_only, reg_paths.spot, reg_paths.factors)
print(f"backward induction:    {t_bwd*1e3:9.1f} ms")

_, val_paths = bench(sim_only, jax.random.key(13))
t_fwd, _ = bench(forward_only, val_paths.spot, val_paths.factors, regression)
print(f"forward pass:          {t_fwd*1e3:9.1f} ms")

print(f"sum (2x sim):          {(2*t_sim + t_bwd + t_fwd)*1e3:9.1f} ms")
