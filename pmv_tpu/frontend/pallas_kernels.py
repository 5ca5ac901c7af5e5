"""Pallas TPU kernels for the image-domain hot loops.

``min_eig_response``: the Shi-Tomasi corner response
(ShiTomasiFeatureExtractor.cpp:49-75 math: central-difference gradients ->
structure tensor -> 3x3 box blur -> closed-form min eigenvalue) fused into a
single HBM pass. The XLA version (pmv_tpu.frontend.image) materializes the
gradient/product intermediates in HBM; this kernel streams overlapping
row-bands (2-row halo) from HBM into VMEM with explicit async DMA and writes
only the response — HBM traffic drops from ~6 image round trips to ~2.

On non-TPU backends the kernel runs in interpreter mode so the same code
path is testable on the CPU mesh.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_HALO = 4  # needs >= 2 (gradient + blur stencils); 4 keeps the DMA'd
# row-band height 8-aligned (Mosaic tiling requires slice dim0 % 8 == 0)


def _make_kernel(tile_rows: int, width: int, dtype):
    def kernel(img_hbm, out_ref):
        i = pl.program_id(0)

        def body(scratch, sem):
            cp = pltpu.make_async_copy(
                img_hbm.at[pl.ds(i * tile_rows, tile_rows + 2 * _HALO), :],
                scratch,
                sem,
            )
            cp.start()
            cp.wait()
            x = scratch[:]

            # Mosaic has no in-kernel scatter; express the stencils with
            # edge-replicated concatenated shifts (border rows/cols are halo
            # and sliced away on write-out).
            def sh_l(v):
                return jnp.concatenate([v[:, 1:], v[:, -1:]], axis=1)

            def sh_r(v):
                return jnp.concatenate([v[:, :1], v[:, :-1]], axis=1)

            def sh_u(v):
                return jnp.concatenate([v[1:, :], v[-1:, :]], axis=0)

            def sh_d(v):
                return jnp.concatenate([v[:1, :], v[:-1, :]], axis=0)

            gx = (sh_l(x) - sh_r(x)) * 0.5
            gy = (sh_u(x) - sh_d(x)) * 0.5

            def blur3(v):
                h = (sh_l(v) + v + sh_r(v)) / 3.0
                return (sh_u(h) + h + sh_d(h)) / 3.0

            Ixx = blur3(gx * gx)
            Iyy = blur3(gy * gy)
            Ixy = blur3(gx * gy)
            mean = (Ixx + Iyy) * 0.5
            d = (Ixx - Iyy) * 0.5
            rad = jnp.sqrt(d * d + Ixy * Ixy)
            resp = mean - rad
            out_ref[:] = resp[_HALO:-_HALO, :]

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((tile_rows + 2 * _HALO, width), dtype),
            sem=pltpu.SemaphoreType.DMA(()),
        )

    return kernel


@functools.partial(jax.jit, static_argnames=("tile_rows", "interpret"))
def min_eig_response(
    img: jax.Array, tile_rows: int = 64, interpret: bool | None = None
) -> jax.Array:
    """Fused Shi-Tomasi response map, (H, W) -> (H, W).

    Matches pmv_tpu.frontend.image.min_eig_response away from the border
    band (the halo uses edge replication; the XLA reference zeroes the 1-px
    gradient border — both give near-zero response there, well inside the
    suppression radius of any real corner).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    H, W = img.shape
    n_tiles = -(-H // tile_rows)
    Hp = n_tiles * tile_rows
    Wp = -(-W // 128) * 128  # Mosaic: DMA slice lanes must be 128-aligned
    padded = jnp.pad(
        img, ((_HALO, _HALO + (Hp - H)), (0, Wp - W)), mode="edge"
    )

    out = pl.pallas_call(
        _make_kernel(tile_rows, Wp, img.dtype),
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((tile_rows, Wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((Hp, Wp), img.dtype),
        interpret=interpret,
    )(padded)
    return out[:H, :W]
