"""Benchmark: 3-factor-seasonal LSMC of a 1-year ratcheted daily storage.

Prints ONE JSON line: paths x steps per second per chip for the full LSMC
valuation step (path simulation + backward induction with per-step regression
+ forward pass with deltas/profiles/trigger prices), measured on real
hardware after compilation.  The reference publishes no hardware numbers
(BASELINE.md) — vs_baseline is the ratio against the previous recorded round
(1.0 when none).

Config (BASELINE.json headline): 365 daily decision steps, inventory-dependent
ratchets, 3-factor seasonal model, 9-term basis, dual simulation, 100
inventory grid points.
"""
import json
import os
import sys
import time

import numpy as np


def main():
    if "--scaling" in sys.argv:
        # Mesh-size sweep (BASELINE.md >=80% path-scaling efficiency metric);
        # see bench_scaling.py.
        from bench_scaling import main as scaling_main

        scaling_main()
        return

    num_sims = int(os.environ.get("BENCH_NUM_SIMS", 262_144))
    num_steps = int(os.environ.get("BENCH_NUM_STEPS", 365))
    num_grid = int(os.environ.get("BENCH_NUM_GRID", 100))
    repeats = int(os.environ.get("BENCH_REPEATS", 3))

    import jax

    # Persistent compilation cache: first-compile latency on the tunneled
    # backend grew to several minutes within long sessions; caching lets
    # repeated bench invocations (and the driver's recording run) skip it.
    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax without the knobs

    n_chips = len(jax.devices())

    from __graft_entry__ import _build_case
    import jax.numpy as jnp
    from storage_tpu.parallel import mesh as pmesh

    dtype = jnp.float32
    num_sims = pmesh.pad_num_sims(num_sims, n_chips)
    inputs, arrays, sim_inputs, monomials = _build_case(
        num_steps=num_steps, num_grid=num_grid, num_sims=num_sims, dtype=dtype
    )
    mesh = pmesh.make_mesh()

    def run():
        result = pmesh.sharded_lsmc_core(
            mesh, arrays, sim_inputs, jax.random.key(11), jax.random.key(13),
            num_sims, inputs.starting_inventory, monomials,
            num_extra_decisions=0, discount_deltas=False,
            terminal_fn=inputs.compiled.terminal_value, ratchet_is_step=False,
            return_sim_data=False,
        )
        # Force a device->host scalar transfer: on tunneled TPU backends
        # jax.block_until_ready returns at dispatch, so only a host read
        # gives a trustworthy end-to-end time.
        float(result["npv"])
        return result

    result = run()  # compile + warmup
    npv = float(result["npv"])
    se = float(result["standard_error"])
    if not np.isfinite(npv):
        print(json.dumps({"metric": "error", "value": 0, "unit": "", "vs_baseline": 0}))
        sys.exit(1)

    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    best = min(times)
    value = num_sims * num_steps / best / n_chips

    prev = None
    try:  # compare against the latest recorded round, if any
        import glob

        records = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "BENCH_r*.json")))
        if records:
            with open(records[-1]) as f:
                rec = json.load(f)
            # Driver records nest the metric under "parsed"; accept both.
            prev = (rec.get("parsed") or rec).get("value")
    except Exception:
        prev = None
    vs_baseline = value / prev if prev else 1.0

    print(
        json.dumps(
            {
                "metric": "lsmc_3f_seasonal_paths_steps_per_s_per_chip",
                "value": round(value, 1),
                "unit": "paths*steps/s/chip",
                "vs_baseline": round(vs_baseline, 3),
            }
        )
    )
    print(
        f"# config: sims={num_sims} steps={num_steps} grid={num_grid} chips={n_chips} "
        f"best={best:.3f}s npv={npv:.1f} se={se:.1f}",
        file=sys.stderr,
    )
    print(
        "# cross-session timing drifts ~5-10% on the tunneled backend "
        "(see BENCH_NOTES_r03.md); BENCH_NUM_SIMS=1048576 runs the 1M-path "
        "streamed headline config, --scaling the mesh-size sweep",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
