"""Fused Pallas threefry + inverse-normal draw kernel (TPU).

The counter-addressed RNG (``models/spot_sim``) draws every normal as
``erfinv``-transformed threefry-2x32 words of explicit (path_id, block)
counter pairs under a fixed base key.  The pure-XLA pipeline materialises two
broadcast [nb, S] uint32 counter panels in HBM before hashing (~575 MB each at
the 262k-path bench config) and then streams them back through the hash and
the normal transform — measured ~2x the genuine hash+erfinv cost
(docs/ROOFLINE.md, round-3 sim-phase decomposition).  This kernel builds the
counters from ``iota`` in registers, runs the 20 threefry rounds and the
inverse-CDF transform on-tile, and writes only the final normal panels, so
HBM traffic is exactly the output bytes.

Bit-identity: the threefry rounds below are the reference algorithm exactly as
JAX lowers it (jax/_src/prng.py ``_threefry2x32_lowering``, rotations
(13,15,26,6)/(17,29,16,24), 5 key-injection rounds), and the normal transform
is ``spot_sim._bits_to_normal``'s f32 branch op-for-op (mantissa trick →
u ∈ (−1,1) → √2·erfinv).  ``lax.erf_inv`` lowers to the same rational
approximation inside Mosaic as in XLA elementwise HLO, so the kernel's draws
are bit-identical to the XLA pipeline — pinned by tests/test_rng_kernel.py on
CPU (interpret mode) and verified on TPU hardware before the round-4 goldens
were kept unchanged.

Reference anchor: this replaces the reference's CPU Mersenne-Twister
simulation boundary (LsmcValuationParameters.cs:179-193) as the framework's
native random-draw engine.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _rotl(x, d: int):
    return lax.shift_left(x, jnp.uint32(d)) | lax.shift_right_logical(
        x, jnp.uint32(32 - d)
    )


_ROT_A = (13, 15, 26, 6)
_ROT_B = (17, 29, 16, 24)


def threefry2x32(k0, k1, x0, x1):
    """The threefry-2x32 hash, exactly as JAX's unrolled lowering
    (jax/_src/prng.py ``_threefry2x32_lowering`` with use_rolled_loops=False):
    same key schedule, rotation constants and round-injection order, so the
    output words are bit-identical to ``jax.random``'s threefry stream."""
    ks0, ks1 = k0, k1
    ks2 = k0 ^ k1 ^ jnp.uint32(0x1BD11BDA)

    def rounds(x0, x1, rots):
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r)
            x1 = x0 ^ x1
        return x0, x1

    x0 = x0 + ks0
    x1 = x1 + ks1
    x0, x1 = rounds(x0, x1, _ROT_A)
    x0 = x0 + ks1
    x1 = x1 + ks2 + jnp.uint32(1)
    x0, x1 = rounds(x0, x1, _ROT_B)
    x0 = x0 + ks2
    x1 = x1 + ks0 + jnp.uint32(2)
    x0, x1 = rounds(x0, x1, _ROT_A)
    x0 = x0 + ks0
    x1 = x1 + ks1 + jnp.uint32(3)
    x0, x1 = rounds(x0, x1, _ROT_B)
    x0 = x0 + ks1
    x1 = x1 + ks2 + jnp.uint32(4)
    x0, x1 = rounds(x0, x1, _ROT_A)
    x0 = x0 + ks2
    x1 = x1 + ks0 + jnp.uint32(5)
    return x0, x1


def _bits_to_normal_f32(bits):
    """uint32 word → standard normal, op-for-op ``spot_sim._bits_to_normal``
    (f32 branch): mantissa-packed uniform on [0,1) → (−1,1) → √2·erfinv."""
    mantissa = lax.shift_right_logical(bits, jnp.uint32(9)) | jnp.uint32(0x3F800000)
    x = lax.bitcast_convert_type(mantissa, jnp.float32) - 1.0
    lo = np.nextafter(np.float32(-1.0), np.float32(0.0))
    u = jnp.maximum(x * 2.0 - 1.0, lo)
    return np.float32(np.sqrt(2.0)) * lax.erf_inv(u)


def _normal_halves_kernel(scal_ref, ids_ref, z1_ref, z2_ref, *, row_tile):
    k0 = scal_ref[0]
    k1 = scal_ref[1]
    b0 = scal_ref[2]
    j = pl.program_id(1)  # row (block-counter) tile index — inner grid dim
    nrows, ncols = z1_ref.shape
    row0 = jnp.uint32(j) * jnp.uint32(row_tile)
    lo = b0 + row0 + lax.broadcasted_iota(jnp.uint32, (nrows, ncols), 0)
    hi = jnp.broadcast_to(ids_ref[0, :], (nrows, ncols))
    w1, w2 = threefry2x32(k0, k1, hi, lo)
    z1_ref[:] = _bits_to_normal_f32(w1)
    z2_ref[:] = _bits_to_normal_f32(w2)


def _normal_halves_signed_kernel(scal_ref, ids_ref, sign_ref, z1_ref, z2_ref, *, row_tile):
    k0 = scal_ref[0]
    k1 = scal_ref[1]
    b0 = scal_ref[2]
    j = pl.program_id(1)
    nrows, ncols = z1_ref.shape
    row0 = jnp.uint32(j) * jnp.uint32(row_tile)
    lo = b0 + row0 + lax.broadcasted_iota(jnp.uint32, (nrows, ncols), 0)
    hi = jnp.broadcast_to(ids_ref[0, :], (nrows, ncols))
    w1, w2 = threefry2x32(k0, k1, hi, lo)
    sign = sign_ref[0, :]
    z1_ref[:] = _bits_to_normal_f32(w1) * sign[None, :]
    z2_ref[:] = _bits_to_normal_f32(w2) * sign[None, :]


def pick_tiles(nb: int, s: int):
    """(row_tile, s_tile) — the lane dim wants multiples of 128; favour wide
    column tiles (the compute is elementwise, bigger tiles amortise pipeline
    overhead) while keeping ~4 VMEM-resident output buffers under ~2 MB."""
    if s % 128 != 0:
        return 0, 0  # ragged path counts: XLA fallback
    s_tile = min(s, 4096)
    row_tile = 8
    return row_tile, s_tile


@functools.partial(
    jax.jit, static_argnames=("nb", "with_sign", "row_tile", "s_tile", "interpret")
)
def normal_halves_pallas(
    key_data: jnp.ndarray,  # [2] uint32 raw threefry key words
    b0,  # scalar uint32: first block index
    nb: int,  # static row count (blocks)
    ids: jnp.ndarray,  # [S] uint32 counter-hi per column (path identity)
    sign: jnp.ndarray | None,  # [S] f32 ±1 antithetic sign, or None
    *,
    with_sign: bool,
    row_tile: int,
    s_tile: int,
    interpret: bool = False,
):
    """(z1, z2) [nb, S] f32 — the normal-transformed first/second threefry
    words of counter pairs (ids[s], b0+r), bit-identical to the XLA pipeline
    (``spot_sim._hash_counter_pairs`` + ``_bits_to_normal``)."""
    s = ids.shape[0]
    scal = jnp.stack(
        [key_data[0], key_data[1], jnp.asarray(b0, jnp.uint32)]
    ).astype(jnp.uint32)
    grid = (pl.cdiv(s, s_tile), pl.cdiv(nb, row_tile))  # rows inner: the
    # ids/sign block index is constant while rows vary, so its DMA is skipped
    # on revisits and each column tile of paths is loaded once.
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, s_tile), lambda i, j: (0, i)),
    ]
    operands = [scal, ids.reshape(1, s)]
    if with_sign:
        kernel = functools.partial(_normal_halves_signed_kernel, row_tile=row_tile)
        in_specs.append(pl.BlockSpec((1, s_tile), lambda i, j: (0, i)))
        operands.append(sign.reshape(1, s))
    else:
        kernel = functools.partial(_normal_halves_kernel, row_tile=row_tile)
    out_specs = [
        pl.BlockSpec((row_tile, s_tile), lambda i, j: (j, i)),
        pl.BlockSpec((row_tile, s_tile), lambda i, j: (j, i)),
    ]
    z1, z2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((nb, s), jnp.float32),
            jax.ShapeDtypeStruct((nb, s), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return z1, z2
