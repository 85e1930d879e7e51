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


def _worker_main(argv):
    """Multi-process sweep worker: one jax.distributed process of a
    ``--multiprocess`` run.  Prints one ROW json line from process 0."""
    proc_id, nprocs, port, ndev = (int(a) for a in argv[:4])
    num_sims_per_chip = int(argv[4])
    num_steps, num_grid, repeats = int(argv[5]), int(argv[6]), int(argv[7])

    os.environ["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={ndev}"
    import jax

    jax.config.update("jax_platforms", "cpu")  # CPU harness; on a real pod
    # slice jax.distributed discovers TPUs and this forcing is removed by the
    # launcher environment.
    from storage_tpu.parallel import distributed as dist

    dist.initialize(f"localhost:{port}", num_processes=nprocs, process_id=proc_id)

    import jax.numpy as jnp
    from __graft_entry__ import _build_case
    from storage_tpu.parallel import mesh as pmesh

    total_dev = nprocs * ndev
    num_sims = num_sims_per_chip * total_dev
    dtype = jnp.float32
    inputs, arrays, sim_inputs, monomials = _build_case(
        num_steps=num_steps, num_grid=num_grid, num_sims=num_sims, dtype=dtype
    )
    mesh = dist.global_mesh()

    def run():
        result = pmesh.sharded_lsmc_core(
            mesh, arrays, sim_inputs, jax.random.key(11), jax.random.key(13),
            num_sims, inputs.starting_inventory, monomials,
            num_extra_decisions=0, discount_deltas=False,
            terminal_fn=inputs.compiled.terminal_value,
            ratchet_is_step=False,
        )
        return float(result["npv"])  # replicated; forces completion

    npv = run()
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        run()
        times.append(time.perf_counter() - t0)
    best = min(times)
    throughput = num_sims * num_steps / best
    if proc_id == 0:
        print("ROW " + json.dumps({
            "processes": nprocs,
            "devices": total_dev,
            "paths": num_sims,
            "wall_s": round(best, 4),
            "paths_steps_per_s": round(throughput, 1),
            "per_chip": round(throughput / total_dev, 1),
            "npv": round(npv, 2),
        }), flush=True)


def run_multiprocess_sweep(proc_counts=(1, 2), ndev=4, num_sims_per_chip=None,
                           num_steps=None, num_grid=None, repeats=None):
    """Drive the weak-scaling sweep across OS-process counts (VERDICT r03
    item 7): each row is a fresh ``jax.distributed`` job of ``nprocs``
    processes x ``ndev`` devices at fixed per-device load, so the efficiency
    column measures real cross-process collectives (gloo on the CPU harness;
    the same code path rides ICI/DCN on a pod slice)."""
    import socket
    import subprocess

    num_sims_per_chip = num_sims_per_chip or int(
        os.environ.get("BENCH_NUM_SIMS_PER_CHIP", 8192)
    )
    num_steps = num_steps or int(os.environ.get("BENCH_NUM_STEPS", 60))
    num_grid = num_grid or int(os.environ.get("BENCH_NUM_GRID", 40))
    repeats = repeats or int(os.environ.get("BENCH_REPEATS", 3))

    rows = []
    for nprocs in proc_counts:
        with socket.socket() as s:
            s.bind(("localhost", 0))
            port = s.getsockname()[1]
        procs = [
            subprocess.Popen(
                [sys.executable, os.path.abspath(__file__), "--worker",
                 str(i), str(nprocs), str(port), str(ndev),
                 str(num_sims_per_chip), str(num_steps), str(num_grid),
                 str(repeats)],
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            )
            for i in range(nprocs)
        ]
        row = None
        for p in procs:
            out, _ = p.communicate(timeout=1800)
            if p.returncode != 0:
                raise RuntimeError(f"scaling worker failed:\n{out}")
            for line in out.splitlines():
                if line.startswith("ROW "):
                    row = json.loads(line[4:])
        if row is None:
            raise RuntimeError("no ROW line from process 0")
        rows.append(row)
    # On the CPU harness the virtual devices oversubscribe the physical
    # cores (e.g. 2 processes x 4 devices on a 2-core host), so a timing
    # ratio measures oversubscription, not scaling — report those rows as
    # CORRECTNESS-ONLY (efficiency n/a).  A pod run with real chips is the
    # first meaningful efficiency datum; the device_sweep is the real
    # single-host artifact.
    oversubscribed = max(proc_counts) * ndev > (os.cpu_count() or 1)
    base = rows[0]["per_chip"]
    for r in rows:
        r["efficiency"] = (
            None if oversubscribed else round(r["per_chip"] / base, 4)
        )
    return {
        "metric": "scaling_sweep_multiprocess",
        "config": {
            "sims_per_chip": num_sims_per_chip,
            "steps": num_steps,
            "grid": num_grid,
            "devices_per_process": ndev,
            "backend": "cpu-harness",
            "efficiency_note": (
                "correctness-only: virtual devices oversubscribe the host "
                "cores; timing ratios are not scaling efficiencies"
            ) if oversubscribed else "",
        },
        "rows": rows,
    }


def main():
    if "--worker" in sys.argv:
        _worker_main(sys.argv[sys.argv.index("--worker") + 1:])
        return
    if "--multiprocess" in sys.argv:
        result = run_multiprocess_sweep()
    else:
        result = run_sweep()
    print(json.dumps(result))
    out_path = os.environ.get("BENCH_SCALING_OUT")
    if out_path:
        with open(out_path, "w") as f:
            json.dump(result, f, indent=2)
    effs = [r["efficiency"] for r in result["rows"] if r["efficiency"] is not None]
    if effs:
        print(
            f"# {len(result['rows'])} row(s); worst efficiency {min(effs):.1%} "
            f"(target >=80% at multi-host)",
            file=sys.stderr,
        )
    else:
        print(
            f"# {len(result['rows'])} row(s); correctness-only "
            f"(oversubscribed harness: efficiency n/a)",
            file=sys.stderr,
        )


if __name__ == "__main__":
    main()
