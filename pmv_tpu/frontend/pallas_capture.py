"""Pallas TPU kernel for LK search-region block capture.

The tracker loads every feature's (Rg, Rg) search region from each freshly
built pyramid level once per frame (lucas_kanade._capture_region — the TPU
replacement for OpenCV's per-feature window reads inside
``cv::calcOpticalFlowPyrLK``, OpenCVLucasKanadeFM.cpp:15). As a vmapped
``lax.dynamic_slice`` that is an XLA gather from a freshly-written source,
measured ~2.3 ms/frame at production shapes — the largest single line in
the round-3 steady-state profile.

This kernel replaces the gather with VMEM-resident extraction:

- the whole (padded) pyramid level is staged in VMEM (KITTI level 0 is
  ~2.6 MB — it fits with room to spare);
- each feature's block is cut by one aligned dynamic slice (sublane offset
  rounded to 8, lane offset to 128 — the granularity Mosaic slices at full
  speed) followed by two ``pltpu.roll``s that absorb the residual (dr, dc)
  offset; the kernel stores the full aligned (R8, C128) slab (Mosaic
  cannot lower a static crop of a loaded value inside ``fori_loop`` — it
  becomes an unsupported gather) and XLA crops to (Rg, Rg) afterwards, a
  cheap contiguous slice;
- blocks are written feature-major (N, Rg, Rg); the feature-lanes
  transpose for pmv_tpu.frontend.pallas_lk (``capture_lanes``) stays in
  XLA, where a single transpose of contiguous kernel output is cheap.

Capture is inherently per-level: the region is centered on the *current*
guess, which coarser pyramid levels refine before finer ones run, so one
kernel call handles one level (matching lucas_kanade's structure).

On non-TPU backends the kernel runs in interpreter mode so the CPU-mesh
suite can assert bit-equality with the XLA gather path
(tests/test_pallas_capture.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pmv_tpu.frontend import lucas_kanade as lk

F_PER = 32  # features per grid program


def _rnd(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(Rg: int, R8: int, C128: int):
    def kernel(offs_ref, img_ref, out_ref):
        i = pl.program_id(0)

        def body(f, _):
            g = i * F_PER + f
            r0a = offs_ref[g, 0]
            dr = offs_ref[g, 1]
            c0a = offs_ref[g, 2]
            dc = offs_ref[g, 3]
            slab = img_ref[
                pl.ds(pl.multiple_of(r0a, 8), R8),
                pl.ds(pl.multiple_of(c0a, 128), C128),
            ]
            # Roll the residual offset away: out[r, c] = slab[r+dr, c+dc].
            slab = pltpu.roll(slab, (R8 - dr) % R8, 0)
            slab = pltpu.roll(slab, (C128 - dc) % C128, 1)
            out_ref[pl.ds(f, 1)] = slab[None]
            return 0

        lax.fori_loop(0, F_PER, body, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("Rg", "rows", "cols", "interpret")
)
def _capture_call(img_al, r0, c0, Rg: int, rows: int, cols: int, interpret: bool):
    """img_al: (rows, cols) aligned padded level; r0/c0: (N,) block origins
    (already clipped to the padded level). Returns (N, Rg, Rg) blocks."""
    N = r0.shape[0]
    R8 = _rnd(Rg + 7, 8)
    C128 = _rnd(Rg + 127, 128)
    r0a = (r0 // 8) * 8
    c0a = (c0 // 128) * 128
    offs = jnp.stack([r0a, r0 - r0a, c0a, c0 - c0a], axis=-1).astype(jnp.int32)
    N_pad = _rnd(N, F_PER)
    if N_pad != N:
        offs = jnp.concatenate(
            [offs, jnp.zeros((N_pad - N, 4), jnp.int32)], axis=0
        )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(N_pad // F_PER,),
        in_specs=[pl.BlockSpec((rows, cols), lambda i, o: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((F_PER, R8, C128), lambda i, o: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _make_kernel(Rg, R8, C128),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((N_pad, R8, C128), img_al.dtype),
        interpret=interpret,
    )(offs, img_al)
    return out[:N, :Rg, :Rg]


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


def capture_level(
    img_padded: jax.Array,
    center: jax.Array,
    win: int,
    search: int,
    interpret: bool | None = None,
):
    """Drop-in for lucas_kanade._capture_region: (N, Rg, Rg) blocks around
    float ``center`` positions (padded-image coords) plus integer origins."""
    if interpret is None:
        interpret = _auto_interpret()
    H, W = img_padded.shape
    Rg = lk.region_size(win, search)
    half = (win - 1) / 2.0
    m = (Rg - win) // 2
    r0 = jnp.clip(
        jnp.floor(center[:, 1] - half).astype(jnp.int32) - m, 0, max(H - Rg, 0)
    )
    c0 = jnp.clip(
        jnp.floor(center[:, 0] - half).astype(jnp.int32) - m, 0, max(W - Rg, 0)
    )
    R8 = _rnd(Rg + 7, 8)
    C128 = _rnd(Rg + 127, 128)
    rows = _rnd(H + (R8 - Rg), 8)
    cols = _rnd(W + (C128 - Rg), 128)
    img_al = jnp.pad(img_padded, ((0, rows - H), (0, cols - W)))
    blocks = _capture_call(img_al, r0, c0, Rg, rows, cols, interpret)
    return blocks, r0, c0


def capture_feature_major(pyr: tuple, pts: jax.Array, win: int = 21,
                          search: int | None = None,
                          interpret: bool | None = None) -> tuple:
    """All-level capture around fixed ``pts`` (init/reseed path) in the
    feature-major (N, Rg, Rg) tap-tracker layout."""
    search = lk._resolve_search(win, search)
    PAD = lk._pad_for(win, search)
    out = []
    for lvl, img in enumerate(pyr):
        s = 2.0 ** lvl
        img_p = jnp.pad(img, PAD, mode="edge")
        out.append(capture_level(img_p, pts / s + PAD, win, search, interpret))
    return tuple(out)


def capture_lanes(pyr: tuple, pts: jax.Array, win: int = 21,
                  search: int | None = None,
                  interpret: bool | None = None) -> tuple:
    """All-level capture in the (Rg, Rg, N) feature-lanes layout
    (pmv_tpu.frontend.pallas_lk's block format)."""
    out = []
    for blk, r0, c0 in capture_feature_major(pyr, pts, win, search, interpret):
        out.append((jnp.transpose(blk, (1, 2, 0)), r0, c0))
    return tuple(out)
