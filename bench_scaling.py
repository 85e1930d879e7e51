"""Path-scaling efficiency harness (BASELINE.md north star: >=80% scaling).

Sweeps mesh sizes 1..N over the available devices at FIXED per-chip load
(weak scaling: paths grow with chips, the production regime), recording
throughput and efficiency per mesh size.  Runs unmodified on real multi-chip
hardware; on this environment's single chip it degenerates to one row, and
CI smoke-tests the harness itself on the virtual 8-device CPU mesh
(tests/test_scaling_harness.py).

Usage:
    python bench_scaling.py                  # sweep 1..len(jax.devices())
    BENCH_NUM_SIMS_PER_CHIP=131072 python bench_scaling.py
    python bench.py --scaling                # same, via the bench entry point

Output: one JSON line {"metric": "scaling_sweep", "rows": [...]} where each
row is {chips, paths, wall_s, paths_steps_per_s, per_chip, efficiency};
efficiency = per-chip throughput relative to the 1-chip row.
"""
import json
import os
import sys
import time


def run_sweep(num_sims_per_chip=None, num_steps=None, num_grid=None,
              repeats=None, mesh_sizes=None, stream=None):
    num_sims_per_chip = num_sims_per_chip or int(
        os.environ.get("BENCH_NUM_SIMS_PER_CHIP", 131_072)
    )
    num_steps = num_steps or int(os.environ.get("BENCH_NUM_STEPS", 365))
    num_grid = num_grid or int(os.environ.get("BENCH_NUM_GRID", 100))
    repeats = repeats or int(os.environ.get("BENCH_REPEATS", 3))

    import jax

    try:  # share bench.py's persistent compile cache
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from __graft_entry__ import _build_case
    import jax.numpy as jnp
    from storage_tpu.parallel import mesh as pmesh

    n_devices = len(jax.devices())
    if mesh_sizes is None:
        mesh_sizes = sorted({m for m in range(1, n_devices + 1)})

    dtype = jnp.float32
    rows = []
    for chips in mesh_sizes:
        num_sims = num_sims_per_chip * chips
        inputs, arrays, sim_inputs, monomials = _build_case(
            num_steps=num_steps, num_grid=num_grid, num_sims=num_sims,
            dtype=dtype,
        )
        mesh = pmesh.make_mesh(chips)

        def run():
            result = pmesh.sharded_lsmc_core(
                mesh, arrays, sim_inputs, jax.random.key(11), jax.random.key(13),
                num_sims, inputs.starting_inventory, monomials,
                num_extra_decisions=0, discount_deltas=False,
                terminal_fn=inputs.compiled.terminal_value,
                ratchet_is_step=False, stream=stream,
            )
            # Host read forces end-to-end completion (tunneled backends
            # return from block_until_ready at dispatch).
            return float(result["npv"])

        npv = run()  # compile + warmup
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        best = min(times)
        throughput = num_sims * num_steps / best
        rows.append(
            {
                "chips": chips,
                "paths": num_sims,
                "wall_s": round(best, 4),
                "paths_steps_per_s": round(throughput, 1),
                "per_chip": round(throughput / chips, 1),
                "npv": round(npv, 2),
            }
        )
    base = rows[0]["per_chip"]
    for r in rows:
        r["efficiency"] = round(r["per_chip"] / base, 4)
    return {
        "metric": "scaling_sweep",
        "config": {
            "sims_per_chip": num_sims_per_chip,
            "steps": num_steps,
            "grid": num_grid,
            "backend": jax.default_backend(),
        },
        "rows": rows,
    }


def main():
    result = run_sweep()
    print(json.dumps(result))
    out_path = os.environ.get("BENCH_SCALING_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
    worst = min(r["efficiency"] for r in result["rows"])
    print(
        f"# {len(result['rows'])} mesh size(s); worst efficiency {worst:.1%} "
        f"(target >=80% at multi-host)",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
