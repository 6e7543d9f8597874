"""Pallas TPU kernel for bulk Gaussian sampling.

The fixed-step solver path samples every Brownian increment for a solve in one
pass (`integrate.sample_grid_noise`). With the default JAX threefry PRNG that
is a long chain of int ops on the VPU; this kernel uses the TPU's *hardware*
PRNG (`pltpu.prng_random_bits`) + Box–Muller, which generates bits at near
memory speed. Deterministic w.r.t. (seed, shape, tiling): each grid tile
reseeds with ``seed + program_id``.

Opt-in: pass ``rng_impl='pallas'`` through ``sample_grid_noise`` / ``sdeint``;
the default stays threefry for cross-backend bitwise reproducibility (the
hardware PRNG stream differs from threefry's).

Measured on v5e-1 (2048-row tiles, 8.4M f32 samples): raw bits ~2.3 G/s,
box-muller normals ~1.3 G/s, XLA threefry normals ~2.2 G/s — i.e. threefry is
already near bandwidth and noise generation is NOT a solver bottleneck
(a typical solve consumes <1M samples). The kernel is kept for cases that
want the hardware PRNG stream or fusion into larger Pallas pipelines.
"""

import functools
import math

import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    _HAVE_PALLAS = True
except Exception:  # pragma: no cover
    _HAVE_PALLAS = False

_TWO_PI = 2.0 * math.pi


def _normal_kernel(seed_ref, out_ref):
    pltpu.prng_seed(seed_ref[0] + pl.program_id(0))
    shape = out_ref.shape
    bits1 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    bits2 = pltpu.bitcast(pltpu.prng_random_bits(shape), jnp.uint32)
    # 24-bit mantissa uniforms in (0, 1): u = (bits >> 8) * 2^-24 + 2^-25.
    # (Mosaic can't cast uint32->f32; the top-24-bit value fits int32 exactly.)
    i1 = pltpu.bitcast(bits1 >> 8, jnp.int32)
    i2 = pltpu.bitcast(bits2 >> 8, jnp.int32)
    u1 = i1.astype(jnp.float32) * (2.0 ** -24) + (2.0 ** -25)
    u2 = i2.astype(jnp.float32) * (2.0 ** -24) + (2.0 ** -25)
    r = jnp.sqrt(-2.0 * jnp.log(u1))
    out_ref[:] = r * jnp.cos(_TWO_PI * u2)


@functools.partial(jax.jit, static_argnums=(1, 2, 3))
def pallas_normal(seed, shape, dtype=jnp.float32, interpret=False):
    """Standard normals of ``shape`` from the TPU hardware PRNG.

    ``seed``: int32 scalar (array or python int). The output is generated in
    row tiles of the flattened-to-2D shape; the stream is a pure function of
    (seed, shape).
    """
    if not _HAVE_PALLAS:
        raise RuntimeError("Pallas is unavailable in this environment.")
    shape = tuple(int(s) for s in shape)
    n = 1
    for s in shape:
        n *= s
    # Flatten to (rows, 128) padded; tile rows.
    lanes = 128
    rows = -(-n // lanes)
    sublanes = 8
    rows_padded = -(-rows // sublanes) * sublanes
    tile_rows = min(rows_padded, 2048)
    while rows_padded % tile_rows:
        tile_rows //= 2
    grid = rows_padded // tile_rows

    seed_arr = jnp.asarray([seed], jnp.int32)
    out = pl.pallas_call(
        _normal_kernel,
        grid=(grid,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((tile_rows, lanes), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows_padded, lanes), jnp.float32),
        interpret=interpret,
    )(seed_arr)
    out = out.reshape(-1)[:n].reshape(shape)
    return out.astype(dtype)
