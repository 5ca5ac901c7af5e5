"""Pallas TPU kernel for pyramidal Lucas-Kanade (the per-chip hot loop).

TPU-native replacement for the tap-matrix XLA tracker in
``pmv_tpu.frontend.lucas_kanade`` (itself a rewrite of the reference's
``cv::calcOpticalFlowPyrLK`` call, OpenCVLucasKanadeFM.cpp:15). The XLA
path formulates subpixel sampling as per-feature (win, Rg) tap matmuls;
those matrices are ~23x55 against a 128x128 systolic array, so the MXU
runs at ~3% utilization and the tracker costs ~10 ms/frame on chip.

This kernel reformulates the whole level as VPU work in a feature-lanes
layout:

- blocks are stored ``(Rg, Rg, N)`` — N features across the 128-lane axis
  (512 features = exactly 4 lane groups, zero padding waste; the XLA
  layout pads Rg=55 lanes to 128);
- each feature's subpixel window shares ONE fractional offset, so a
  bilinear sample is a per-feature integer window selection (a binary-
  shift decomposition: ceil(log2 K) masked static shifts over the
  K = Rg - w offsets) followed by a two-tap blend of the selected strip —
  pure lane-parallel VPU select/FMA with no gathers and no matmuls;
- each level runs as TWO kernels — template statistics from the cached
  block, then the full LK iteration loop with the search region
  VMEM-resident (iterations cost zero HBM traffic). The split gives each
  kernel its own scoped-VMEM stack; large regions (the reference-default
  win=32) additionally run one single-buffered pallas_call per lane group
  because pallas's grid pipelining double-buffers block I/O
  (see _grid_pipelines).

On non-TPU backends the kernel runs in interpreter mode, which keeps the
code path testable on the CPU mesh (tests/test_pallas_lk.py asserts
equivalence with the XLA tracker).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pmv_tpu.frontend import lucas_kanade as lk

NB = 128  # features per grid program (one lane group)


def _select_shift(buf, k0i, w: int, K: int, axis: int):
    """Per-lane ``buf[k : k+w]`` along ``axis`` (k = k0i, (1, 1, NB) int32 in
    [0, K-1]) by binary-shift decomposition: ceil(log2(K)) masked static
    shifts instead of K masked adds — ~4x less VPU work at production
    shapes (K = 34). Bit b (highest first) conditionally advances the
    window start by 2^b; the buffer shrinks as the remaining reachable
    extent drops, so late bits touch barely more than w rows. Selected
    values are bit-identical to the masked-sum formulation (pure selects,
    no arithmetic)."""
    if K <= 1:
        return buf[:w] if axis == 0 else buf[:, :w]
    # Out-of-range offsets would otherwise select an arbitrary in-bounds
    # window (the old masked-sum formulation produced zeros instead); all
    # callers clip, but the precondition is load-bearing — enforce it.
    k0i = jnp.clip(k0i, 0, K - 1)
    nbits = (K - 1).bit_length()

    def take(src, start, n):
        """src[start : start+n] along ``axis``, zero-filled past the end.

        Only the out-of-range tail is materialized as zeros (a few rows) —
        padding the whole buffer up front cost a full region-sized copy
        that pushed the win=32 kernels past Mosaic's 16 MB scoped-VMEM
        stack (measured 17.65 MB). The zero rows are only addressable for
        k > K-1, which the clip above excludes — never selected."""
        cur = src.shape[axis]
        stop = min(start + n, cur)
        piece = src[start:stop] if axis == 0 else src[:, start:stop]
        miss = n - (stop - start)
        if miss > 0:
            pad_shape = list(src.shape)
            pad_shape[axis] = miss
            piece = jnp.concatenate(
                [piece, jnp.zeros(pad_shape, src.dtype)], axis=axis
            )
        return piece

    for b in reversed(range(nbits)):
        s = 1 << b
        nxt = w + s - 1  # extent still reachable by the remaining low bits
        bit = (k0i & s) > 0
        buf = jnp.where(bit, take(buf, s, nxt), take(buf, 0, nxt))
    return buf  # after bit 0, extent == w


def _masked_window(region, lr, lc, w: int, rows: int | None = None):
    """Bilinear (w, w, NB) windows from a (Rg, Rg, NB) region at per-lane
    float offsets lr, lc (each (1, 1, NB), pre-clipped to [0, Rg-w-1]).
    ``rows`` overrides the logical row extent (defaults to the physical
    extent).

    Binary-shift window selection FIRST (w+1 rows/cols of the raw region),
    then the separable two-tap blend on the selected strip. Selecting before
    blending is bit-identical to blending the whole region and selecting
    after (the blend is elementwise with one shared fractional weight per
    lane: rows[k] = (1-fr)*region[i0+k] + fr*region[i0+k+1] either way), but
    it never materializes a region-sized blend buffer — the VMEM saving that
    lets the win=32 (Rg=84) reference configuration fit the kernel — and
    runs the blend over w+1 rows instead of Rg. The row selection slices
    dim0 (free on TPU); the column selection slices the sublane dim (cheap
    register rotations).
    """
    Rg_r = rows if rows is not None else region.shape[0]
    Rg_c = region.shape[1]
    K_r = Rg_r - w  # possible integer offsets: floor(lr) in [0, Rg-w-1]
    K_c = Rg_c - w

    i0 = jnp.floor(lr)
    fr = lr - i0
    raw = _select_shift(region, i0.astype(jnp.int32), w + 1, K_r, axis=0)
    strip = (1.0 - fr) * raw[:-1] + fr * raw[1:]  # (w, Rg, NB)

    j0 = jnp.floor(lc)
    fc = lc - j0
    rawc = _select_shift(strip, j0.astype(jnp.int32), w + 1, K_c, axis=1)
    return (1.0 - fc) * rawc[:, :-1] + fc * rawc[:, 1:]  # (w, w, NB)


def _make_template_kernel(Rg: int, win: int):
    """Template-statistics kernel for one pyramid level over NB features.

    Inputs: blk (Rg, Rg, NB) cached template region; scal (8, NB) rows
    [traw_r, traw_c] (float template offsets inside the block). Outputs:
    T / Ix / Iy (win, win, NB) and stats (8, NB) rows
    [Gxx, Gxy, Gyy, inv_det, min_eig] — exactly the quantities of
    lucas_kanade._template_stats.

    Splitting the template pass from the iteration loop gives each kernel
    its own scoped-VMEM stack: the fused single-kernel form needed both the
    template block AND the search region (plus their selection temporaries)
    live at once, which overflowed Mosaic's 16 MB budget at the reference
    win=32 (Rg=84). The T/Ix/Iy handoff is an exact f32 round trip, so the
    split is bit-identical to the fused kernel.
    """
    t_lim = Rg - (win + 2) - 1e-5

    def kernel(blk_ref, scal_ref, T_ref, Ix_ref, Iy_ref, st_ref):
        blk = blk_ref[:]
        nb = blk.shape[2]

        def v(i):  # (1, 1, NB) per-lane scalar row
            return scal_ref[i : i + 1, :].reshape(1, 1, nb)

        # (mirrors lucas_kanade._template_stats)
        F = _masked_window(
            blk,
            jnp.clip(v(0), 0.0, t_lim),
            jnp.clip(v(1), 0.0, t_lim),
            win + 2,
        )
        T = F[1:-1, 1:-1]
        Ix = (F[1:-1, 2:] - F[1:-1, :-2]) * 0.5
        Iy = (F[2:, 1:-1] - F[:-2, 1:-1]) * 0.5
        Gxx = jnp.sum(Ix * Ix, axis=(0, 1), keepdims=True)
        Gxy = jnp.sum(Ix * Iy, axis=(0, 1), keepdims=True)
        Gyy = jnp.sum(Iy * Iy, axis=(0, 1), keepdims=True)
        det = Gxx * Gyy - Gxy * Gxy
        mean = (Gxx + Gyy) * 0.5
        rad = jnp.sqrt(jnp.maximum(((Gxx - Gyy) * 0.5) ** 2 + Gxy * Gxy, 0.0))
        min_eig = (mean - rad) / (win * win)
        inv_det = jnp.where(det > 1e-6, 1.0 / jnp.where(det == 0, 1.0, det), 0.0)

        T_ref[:] = T
        Ix_ref[:] = Ix
        Iy_ref[:] = Iy
        # Mosaic has no in-kernel scatter: assemble by concatenation.
        st_ref[:] = jnp.concatenate(
            [
                Gxx.reshape(1, nb),
                Gxy.reshape(1, nb),
                Gyy.reshape(1, nb),
                inv_det.reshape(1, nb),
                min_eig.reshape(1, nb),
                jnp.zeros((3, nb), blk.dtype),
            ],
            axis=0,
        )

    return kernel


def _make_iter_kernel(Rg: int, win: int, iters: int):
    """LK iteration kernel: runs all ``iters`` updates with the search
    region VMEM-resident.

    Inputs: region (Rg, Rg, NB); T / Ix / Iy (win, win, NB) from the
    template kernel; st (8, NB) rows [Gxx, Gxy, Gyy, inv_det]; scal (8, NB)
    with rows 2-5 = [g_r, g_c, reg_r0, reg_c0] (the caller's shared layout,
    rows 0-1 are the template offsets). Output: (8, NB) rows [g_r', g_c'].

    The guess is carried in global padded coordinates and localized as
    ``(g - half) - reg0`` each iteration — the exact float association of
    lucas_kanade._iterate, keeping the two backends bit-identical where
    the underlying ops are (CPU interpreter vs XLA CPU).
    """
    half = (win - 1) / 2.0
    i_lim = Rg - win - 1.000001

    def kernel(region_ref, T_ref, Ix_ref, Iy_ref, st_ref, scal_ref, out_ref):
        region = region_ref[:]
        T = T_ref[:]
        Ix = Ix_ref[:]
        Iy = Iy_ref[:]
        nb = region.shape[2]

        def sv(ref, i):  # (1, 1, NB) per-lane scalar row
            return ref[i : i + 1, :].reshape(1, 1, nb)

        Gxx = sv(st_ref, 0)
        Gxy = sv(st_ref, 1)
        Gyy = sv(st_ref, 2)
        inv_det = sv(st_ref, 3)
        reg_r0 = sv(scal_ref, 4)
        reg_c0 = sv(scal_ref, 5)

        def body(_, g):
            g_r, g_c = g
            I = _masked_window(
                region,
                jnp.clip(g_r - half - reg_r0, 0.0, i_lim),
                jnp.clip(g_c - half - reg_c0, 0.0, i_lim),
                win,
                rows=Rg,
            )
            r = T - I
            bx = jnp.sum(r * Ix, axis=(0, 1), keepdims=True)
            by = jnp.sum(r * Iy, axis=(0, 1), keepdims=True)
            du = (Gyy * bx - Gxy * by) * inv_det
            dv = (Gxx * by - Gxy * bx) * inv_det
            return (g_r + dv, g_c + du)

        g_r, g_c = lax.fori_loop(
            0, iters, body, (sv(scal_ref, 2), sv(scal_ref, 3))
        )
        out_ref[:] = jnp.concatenate(
            [
                g_r.reshape(1, nb),
                g_c.reshape(1, nb),
                jnp.zeros((6, nb), region.dtype),
            ],
            axis=0,
        )

    return kernel


def _grid_pipelines(Rg: int) -> bool:
    """Whether the multi-step grid (pallas pipelining) fits: pallas
    DOUBLE-BUFFERS each grid step's input/output blocks, so the per-step
    footprint is roughly kernel temporaries + 2x the block I/O. Measured:
    the win=21 production region (Rg=55, ~11 MB total) pipelines fine; the
    win=32 region (Rg=84) overflows at 17.7-18.4 MB WITH double buffering
    but compiles and runs single-buffered (grid=1 per lane group, verified
    on chip both for the template and the iteration kernel). Large regions
    therefore issue one single-step pallas_call per 128-lane group."""
    return 4.9 * Rg * Rg * NB * 4 <= 15.5 * 2**20


def fits_vmem(Rg: int) -> bool:
    """Whether the per-level kernels fit Mosaic's 16 MB scoped-VMEM stack
    (in per-lane-group single-buffered mode for large regions, see
    _grid_pipelines; lane-dim blocks must be a full 128 lanes, so smaller
    lane groups are not an out). The win=32 reference default (Rg=84) is
    measured-good; the bound extrapolates its footprint with ~25% margin.
    Configs beyond it use the XLA tap tracker (steps.lk_module resolves
    'auto' accordingly)."""
    return 3.6 * Rg * Rg * NB * 4 <= 16 * 2**20


@functools.partial(
    jax.jit, static_argnames=("win", "iters", "interpret", "force_groups")
)
def _level_call(
    blk_t, region_t, scal, win: int, iters: int, interpret: bool,
    force_groups: bool = False,
):
    """Two pallas_calls per level: template stats from the cached block,
    then the iteration loop on the fresh search region. Returns (8, N) rows
    [g_r', g_c', min_eig]."""
    Rg, _, N = blk_t.shape
    nb = NB

    def run_groups(n_g: int):
        """One template + one iteration pallas_call over ``n_g`` lane
        groups. grid=n_g pipelines (pallas double-buffers each step's
        block I/O); grid=1 on a pre-sliced group is single-buffered — the
        mode large regions need (see _grid_pipelines)."""
        M = n_g * nb
        w3 = jax.ShapeDtypeStruct((win, win, M), blk_t.dtype)
        blkspec = pl.BlockSpec((Rg, Rg, nb), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        winspec = pl.BlockSpec((win, win, nb), lambda i: (0, 0, i), memory_space=pltpu.VMEM)
        rowspec = pl.BlockSpec((8, nb), lambda i: (0, i), memory_space=pltpu.VMEM)

        def call(blk_g, region_g, scal_g):
            T, Ix, Iy, st = pl.pallas_call(
                _make_template_kernel(Rg, win),
                grid=(n_g,),
                in_specs=[blkspec, rowspec],
                out_specs=[winspec, winspec, winspec, rowspec],
                out_shape=[w3, w3, w3, jax.ShapeDtypeStruct((8, M), blk_t.dtype)],
                interpret=interpret,
            )(blk_g, scal_g)
            out = pl.pallas_call(
                _make_iter_kernel(Rg, win, iters),
                grid=(n_g,),
                in_specs=[blkspec, winspec, winspec, winspec, rowspec, rowspec],
                out_specs=rowspec,
                out_shape=jax.ShapeDtypeStruct((8, M), blk_t.dtype),
                interpret=interpret,
            )(region_g, T, Ix, Iy, st, scal_g)
            return out, st

        return call

    # force_groups is a test hook: interpret mode has no VMEM limit, so the
    # per-lane-group branch would otherwise only ever run on the real chip.
    if (_grid_pipelines(Rg) or interpret) and not force_groups:
        out, st = run_groups(N // nb)(blk_t, region_t, scal)
    else:
        call = run_groups(1)
        outs = [
            call(
                blk_t[..., g * nb : (g + 1) * nb],
                region_t[..., g * nb : (g + 1) * nb],
                scal[:, g * nb : (g + 1) * nb],
            )
            for g in range(N // nb)
        ]
        out = jnp.concatenate([o for o, _ in outs], axis=-1)
        st = jnp.concatenate([s_ for _, s_ in outs], axis=-1)
    # Row layout [g_r', g_c', min_eig]: callers read rows 0-2.
    return jnp.concatenate([out[:2], st[4:5], out[3:]], axis=0)


def _auto_interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pad_n(x, N_pad):
    n = x.shape[-1]
    if n == N_pad:
        return x
    pad = [(0, 0)] * (x.ndim - 1) + [(0, N_pad - n)]
    return jnp.pad(x, pad)


def _track_level_cached(
    blk_t, blk_r0, blk_c0, next_img, pts_level, guess, win, iters, search,
    interpret, force_groups=False,
):
    """Pallas counterpart of lucas_kanade._track_level_cached: same
    contract, blocks in (Rg, Rg, N) feature-lanes layout."""
    PAD = lk._pad_for(win, search)
    Rg = lk.region_size(win, search)
    next_img = jnp.pad(next_img, PAD, mode="edge")
    half = (win - 1) / 2.0

    lim = Rg - (win + 2) - 1e-5
    raw_r = pts_level[:, 1] + PAD - half - 1.0 - blk_r0
    raw_c = pts_level[:, 0] + PAD - half - 1.0 - blk_c0
    ok = (raw_r > -0.75) & (raw_r < lim + 0.75) & (raw_c > -0.75) & (raw_c < lim + 0.75)

    # search region in the next image (aligned-DMA Pallas extraction on TPU,
    # XLA block gather elsewhere), then one transpose into the feature-lanes
    # layout the kernel (and the next frame) use
    region, reg_r0, reg_c0 = lk._capture_region_auto(next_img, guess + PAD, win, search)
    region_t = jnp.transpose(region, (1, 2, 0))

    N = pts_level.shape[0]
    N_pad = -(-N // NB) * NB
    gp = guess + PAD
    scal = jnp.zeros((8, N_pad), jnp.float32)
    scal = scal.at[0, :N].set(raw_r)
    scal = scal.at[1, :N].set(raw_c)
    scal = scal.at[2, :N].set(gp[:, 1])
    scal = scal.at[3, :N].set(gp[:, 0])
    scal = scal.at[4, :N].set(reg_r0.astype(jnp.float32))
    scal = scal.at[5, :N].set(reg_c0.astype(jnp.float32))

    out = _level_call(
        _pad_n(blk_t, N_pad), _pad_n(region_t, N_pad), scal, win, iters,
        interpret, force_groups,
    )
    g = jnp.stack([out[1, :N], out[0, :N]], axis=-1) - PAD
    return g, out[2, :N], ok, (region_t, reg_r0, reg_c0)


@functools.partial(jax.jit, static_argnames=("win", "search"))
def capture_blocks(pyr: tuple, pts, win: int = 32, search: int | None = None):
    """Like lucas_kanade.capture_blocks, but blocks come back in the
    (Rg, Rg, N) feature-lanes layout this module's tracker consumes."""
    search = lk._resolve_search(win, search)
    PAD = lk._pad_for(win, search)
    out = []
    for lvl, img in enumerate(pyr):
        s = 2.0 ** lvl
        img_p = jnp.pad(img, PAD, mode="edge")
        region, r0, c0 = lk._capture_region_auto(img_p, pts / s + PAD, win, search)
        out.append((jnp.transpose(region, (1, 2, 0)), r0, c0))
    return tuple(out)


@functools.partial(
    jax.jit,
    static_argnames=("win", "iters", "search", "interpret", "force_groups"),
)
def track_cached(
    blocks: tuple,
    next_pyr,
    pts,
    valid,
    win: int = 32,
    iters: int = 10,
    min_eig_threshold: float = 1e-4,
    search: int | None = None,
    interpret: bool | None = None,
    force_groups: bool = False,
):
    """Drop-in for lucas_kanade.track_cached with (Rg, Rg, N) blocks.

    Returns (new_pts, status, new_blocks) with identical semantics; the
    per-level work runs as one Pallas kernel per level.
    """
    if interpret is None:
        interpret = _auto_interpret()
    levels = len(next_pyr)
    H, W = next_pyr[0].shape
    search = lk._resolve_search(win, search)
    scale_top = 2.0 ** (levels - 1)
    guess = pts / scale_top
    min_eig0 = jnp.zeros(pts.shape[0], pts.dtype)
    ok_all = jnp.ones(pts.shape[0], bool)
    new_blocks = []
    for lvl in range(levels - 1, -1, -1):
        s = 2.0 ** lvl
        blk_t, br0, bc0 = blocks[lvl]
        guess, min_eig0, ok, captured = _track_level_cached(
            blk_t, br0, bc0, next_pyr[lvl], pts / s, guess, win, iters,
            search, interpret, force_groups,
        )
        ok_all = ok_all & ok
        new_blocks.append(captured)
        if lvl > 0:
            guess = guess * 2.0
    new_pts = guess
    inside = (
        (new_pts[:, 0] >= 0)
        & (new_pts[:, 0] <= W - 1)
        & (new_pts[:, 1] >= 0)
        & (new_pts[:, 1] <= H - 1)
    )
    status = valid & inside & ok_all & (min_eig0 > min_eig_threshold)
    return new_pts, status, tuple(new_blocks[::-1])
