"""On-hardware bit-identity checks for the optional Pallas draw kernel.

The CPU suite pins the kernel's logic in interpret mode; this script
verifies on the REAL TPU that Mosaic's lowering (notably ``lax.erf_inv``)
still produces draws bit-identical to the XLA counter pipeline — re-run
after a jax/libtpu upgrade before enabling STORAGE_TPU_RNG_PALLAS.

Usage: python tools/tpu_bit_checks.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_compile_cache")
    except Exception:
        pass
    from storage_tpu.models import spot_sim

    print("backend:", jax.default_backend())
    key = jax.random.key(11)
    path_ids = jnp.arange(262_144)
    ok = True
    for antithetic in (False, True):
        zx = spot_sim.draw_normal_halves(
            key, 0, 365, path_ids, 3, antithetic, jnp.float32, use_pallas=False
        )
        zp = spot_sim.draw_normal_halves(
            key, 0, 365, path_ids, 3, antithetic, jnp.float32, use_pallas=True
        )
        eq = np.array_equal(np.asarray(zx[0]), np.asarray(zp[0])) and np.array_equal(
            np.asarray(zx[1]), np.asarray(zp[1])
        )
        print(f"antithetic={antithetic}: bit-identical={eq}")
        ok = ok and eq
    print("BIT CHECKS OK" if ok else "BIT CHECKS FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
