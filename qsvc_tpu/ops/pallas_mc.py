"""Pallas TPU kernels for block-granular motion compensation.

The MC predict/update steps move one block-sized window per block by a
block-constant motion vector.  Expressed as vmapped ``dynamic_slice``
gathers XLA runs them at a few percent of HBM bandwidth (~12 ms per
full-frame pass at 1080p); these kernels run the same data movement as a
blocked VMEM pipeline: for every destination tile the 3x3 block
neighbourhood of sources is staged into VMEM (BlockSpec index maps cannot
express overlapping windows, so the neighbourhood arrives as shifted
views of the same array) and the motion shift becomes an in-VMEM
``tpu.dynamic_rotate`` (``pltpu.roll``) plus a static slice.  Motion
vectors ride in SMEM via scalar prefetch.

Mosaic lowering constraints shape the kernel (probed on v5e):

* vector loads at dynamic offsets must be provably 8/128-aligned — so
  dynamic windows use rolls, never ``pl.ds`` with a vector offset;
* ``dynamic_rotate`` needs 32-bit data (the scratch is int32) and
  non-negative shifts (shifts are normalised into [0, n));
* the trailing block dimension must be a multiple of 128, so each grid
  step covers ``fx = max(1, 128 // bs)`` horizontally adjacent blocks;
* all components stack along the row axis of one 2D scratch, letting one
  roll pair serve every component (block-bounded shifts never cross the
  3*bs-row component slabs).

Callers pad the frame by ``bs`` rows and ``fx*bs`` columns per side
(edge values for predict, zeros for update) and check :func:`supported`
(production 1080p/4K luma-resolution geometries pass; odd widths fall
back to the lax formulations in mctf/predict.py / mctf/update.py).
Both kernels require ``|mv| <= block_size`` (true for every level of the
default schedule).

Reference semantics preserved (decorrelate.cpp:69-189, update.cpp:71-148
via the documented deviations in mctf/predict.py and mctf/update.py):

* predict: out block (i,j) = truncating average of the two references at
  ``base + mv_dir``, reads beyond the frame replicating the edge
  (``fill_border``, texture.cpp:55-113);
* update: dest pixel p accumulates ``contrib[p - mv_b]`` over every
  source block b whose motion maps it into b, out-of-frame sources
  dropping to zero.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fx(bs: int) -> int:
    return max(1, 128 // bs)


def supported(H: int, W: int, block_size: int, search_range: int) -> bool:
    bs = block_size
    fx = _fx(bs)
    return (search_range <= bs and H % bs == 0 and W % (fx * bs) == 0
            and bs % 8 == 0)


def _views(bs: int, fx: int, C: int):
    """Nine (3 y x 3 x) views of the padded frame covering every
    destination tile's block neighbourhood plus the +-bs motion reach."""
    nx = 3
    specs = []
    for dy in range(3):
        for dxv in range(nx):
            specs.append(pl.BlockSpec(
                (1, C, bs, fx * bs),
                lambda p, i, j, *_, dy=dy, dxv=dxv: (p, 0, i + dy, j + dxv),
                memory_space=pltpu.VMEM))
    return specs, nx


def _assemble(scratch, refs, bs: int, fx: int, nx: int, C: int):
    """Stage the neighbourhood into the 2D int32 scratch: rows hold the
    C components' 3*bs-row slabs stacked; block-bounded row shifts stay
    inside one slab, so a single roll serves all components."""
    w = fx * bs
    for c in range(C):
        for dy in range(3):
            for dxv in range(nx):
                scratch[(c * 3 + dy) * bs:(c * 3 + dy + 1) * bs,
                        dxv * w:(dxv + 1) * w] = \
                    refs[dy * nx + dxv][0, c].astype(jnp.int32)


def _norm(s, n: int):
    """dynamic_rotate needs shifts in [0, n); |s| <= bs < n always."""
    return jnp.where(s < 0, s + n, s)


def _window(scr, bs: int, fx: int, s: int):
    """Static x-window of the scratch covering sub-block s's +-bs motion
    reach.  Lane rotates need a width that is a multiple of 128, so the
    window is 4*bs wide when that is 128-aligned and the whole scratch
    otherwise."""
    if (4 * bs) % 128 == 0:
        return scr[:, (s + fx - 1) * bs:(s + fx + 3) * bs], bs
    return scr[:, :], (s + fx) * bs


def _predict_kernel(mv_ref, *args, bs: int, C: int, fx: int, nx: int):
    n_in = 2 * 3 * nx
    refs_p = args[0:3 * nx]
    refs_n = args[3 * nx:n_in]
    out_ref, scr_p, scr_n = args[n_in], args[n_in + 1], args[n_in + 2]
    p = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    nby = pl.num_programs(1)
    nbx = pl.num_programs(2) * fx
    _assemble(scr_p, refs_p, bs, fx, nx, C)
    _assemble(scr_n, refs_n, bs, fx, nx, C)
    R = C * 3 * bs
    nb = nby * nbx
    for s in range(fx):
        jj = j * fx + s
        base = (p * 4) * nb + i * nbx + jj
        mvy_p = mv_ref[base]
        mvx_p = mv_ref[base + nb]
        mvy_n = mv_ref[base + 2 * nb]
        mvx_n = mv_ref[base + 3 * nb]
        win_p, lane0 = _window(scr_p, bs, fx, s)
        win_n, _ = _window(scr_n, bs, fx, s)
        Wn = win_p.shape[1]
        rp = pltpu.roll(pltpu.roll(win_p, _norm(-mvy_p, R), 0),
                        _norm(-mvx_p, Wn), 1)
        rn = pltpu.roll(pltpu.roll(win_n, _norm(-mvy_n, R), 0),
                        _norm(-mvx_n, Wn), 1)
        for c in range(C):
            gp = rp[(c * 3 + 1) * bs:(c * 3 + 2) * bs, lane0:lane0 + bs]
            gn = rn[(c * 3 + 1) * bs:(c * 3 + 2) * bs, lane0:lane0 + bs]
            pred = jnp.clip(jax.lax.div(gp + gn, jnp.int32(2)), 0, 255)
            out_ref[0, c, :, s * bs:(s + 1) * bs] = pred.astype(
                out_ref.dtype)


@partial(jax.jit, static_argnames=("block_size",))
def predict_pallas(ref_prev_pad: jnp.ndarray, ref_next_pad: jnp.ndarray,
                   mv: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """Bidirectional block MC prediction.

    ``ref_*_pad``: (P, C, H + 2bs, W + 2*fx*bs) int16, edge-padded;
    ``mv``: (P, 2, 2, By, Bx) int32, |mv| <= bs.  Returns (P, C, H, W)
    clipped truncating averages.
    """
    bs = block_size
    fx = _fx(bs)
    P, C, Hp, Wp = ref_prev_pad.shape
    H, W = Hp - 2 * bs, Wp - 2 * fx * bs
    By, Bx = H // bs, W // bs
    specs, nx = _views(bs, fx, C)
    grid = (P, By, Bx // fx)
    return pl.pallas_call(
        partial(_predict_kernel, bs=bs, C=C, fx=fx, nx=nx),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=specs + _views(bs, fx, C)[0],
            out_specs=pl.BlockSpec(
                (1, C, bs, fx * bs), lambda p, i, j, *_: (p, 0, i, j),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((C * 3 * bs, nx * fx * bs), jnp.int32),
                pltpu.VMEM((C * 3 * bs, nx * fx * bs), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((P, C, H, W), ref_prev_pad.dtype),
    )(mv.reshape(-1), *([ref_prev_pad] * (3 * nx)),
      *([ref_next_pad] * (3 * nx)))


def _update2_kernel(mv_ref, *args, bs: int, C: int, fx: int, nx: int):
    """Both update directions in one pass: the contribution staging (the
    HBM-heavy part) is shared, and the column rotate runs on the sliced
    center rows per component (bs x window) instead of the full 3-slab
    scratch — 2/3 of the rotate work of the one-direction kernel per
    direction."""
    refs = args[0:3 * nx]
    out_ref, scr = args[3 * nx], args[3 * nx + 1]
    p = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    nby = pl.num_programs(1)
    nbx = pl.num_programs(2) * fx
    _assemble(scr, refs, bs, fx, nx, C)
    R = C * 3 * bs
    rows = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    stride = (nby + 2) * (nbx + 2)
    for s in range(fx):
        jj = j * fx + s
        win, lane0 = _window(scr, bs, fx, s)
        Wn = win.shape[1]
        for d in range(2):
            acc = [jnp.zeros((bs, bs), jnp.int32) for _ in range(C)]
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    idx = (((p * 2 + d) * 2) * stride
                           + (i + 1 + dy) * (nbx + 2) + (jj + 1 + dx))
                    myd = mv_ref[idx]
                    mxd = mv_ref[idx + stride]
                    rowr = pltpu.roll(win, _norm(myd, R), 0)
                    lo_r = dy * bs + myd
                    lo_c = dx * bs + mxd
                    m = ((rows >= lo_r) & (rows < lo_r + bs) &
                         (cols >= lo_c) & (cols < lo_c + bs))
                    for c in range(C):
                        rc = pltpu.roll(
                            rowr[(c * 3 + 1) * bs:(c * 3 + 2) * bs, :],
                            _norm(mxd, Wn), 1)
                        sl = rc[:, lane0:lane0 + bs]
                        acc[c] = acc[c] + jnp.where(m, sl, 0)
            for c in range(C):
                out_ref[0, d, c, :, s * bs:(s + 1) * bs] = acc[c]


@partial(jax.jit, static_argnames=("block_size",))
def update2_pallas(contrib_pad: jnp.ndarray, mv_pad: jnp.ndarray,
                   block_size: int) -> jnp.ndarray:
    """Accumulated MC update for BOTH directions in one fused kernel.

    ``contrib_pad``: (P, C, H + 2bs, W + 2*fx*bs) int16, zero-padded;
    ``mv_pad``: (P, 2 dirs, 2 comps(y,x), By + 2, Bx + 2) int32 with
    zeroed borders, |mv| <= bs.  Returns (P, 2, C, H, W) int32
    contribution sums (dir 0 = PREV reference, dir 1 = NEXT)."""
    bs = block_size
    fx = _fx(bs)
    P, C, Hp, Wp = contrib_pad.shape
    H, W = Hp - 2 * bs, Wp - 2 * fx * bs
    By, Bx = H // bs, W // bs
    specs, nx = _views(bs, fx, C)
    grid = (P, By, Bx // fx)
    return pl.pallas_call(
        partial(_update2_kernel, bs=bs, C=C, fx=fx, nx=nx),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec(
                (1, 2, C, bs, fx * bs), lambda p, i, j, *_: (p, 0, 0, i, j),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((C * 3 * bs, nx * fx * bs), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((P, 2, C, H, W), jnp.int32),
    )(mv_pad.reshape(-1), *([contrib_pad] * (3 * nx)))


def _update_kernel(mv_ref, *args, bs: int, C: int, fx: int, nx: int):
    refs = args[0:3 * nx]
    out_ref, scr = args[3 * nx], args[3 * nx + 1]
    p = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    nby = pl.num_programs(1)
    nbx = pl.num_programs(2) * fx
    _assemble(scr, refs, bs, fx, nx, C)
    R = C * 3 * bs
    rows = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (bs, bs), 1)
    stride = (nby + 2) * (nbx + 2)
    for s in range(fx):
        jj = j * fx + s
        win, lane0 = _window(scr, bs, fx, s)
        Wn = win.shape[1]
        acc = [jnp.zeros((bs, bs), jnp.int32) for _ in range(C)]
        for dy in (-1, 0, 1):
            for dx in (-1, 0, 1):
                idx = (p * 2 * stride + (i + 1 + dy) * (nbx + 2)
                       + (jj + 1 + dx))
                myd = mv_ref[idx]
                mxd = mv_ref[idx + stride]
                # dest rr receives contrib[rr - mv_d] iff that lands in
                # source block d: rr in [d*bs + mv_d, d*bs + mv_d + bs)
                rolled = pltpu.roll(pltpu.roll(win, _norm(myd, R), 0),
                                    _norm(mxd, Wn), 1)
                lo_r = dy * bs + myd
                lo_c = dx * bs + mxd
                m = ((rows >= lo_r) & (rows < lo_r + bs) &
                     (cols >= lo_c) & (cols < lo_c + bs))
                for c in range(C):
                    sl = rolled[(c * 3 + 1) * bs:(c * 3 + 2) * bs,
                                lane0:lane0 + bs]
                    acc[c] = acc[c] + jnp.where(m, sl, 0)
        for c in range(C):
            out_ref[0, c, :, s * bs:(s + 1) * bs] = acc[c]


@partial(jax.jit, static_argnames=("block_size",))
def update_pallas(contrib_pad: jnp.ndarray, mv_y_pad: jnp.ndarray,
                  mv_x_pad: jnp.ndarray, block_size: int) -> jnp.ndarray:
    """Accumulated MC update (inverse-gather formulation).

    ``contrib_pad``: (P, C, H + 2bs, W + 2*fx*bs) int16, zero-padded;
    ``mv_*_pad``: (P, By + 2, Bx + 2) int32 with zeroed borders,
    |mv| <= bs.  Returns (P, C, H, W) int32 contribution sums.
    """
    bs = block_size
    fx = _fx(bs)
    P, C, Hp, Wp = contrib_pad.shape
    H, W = Hp - 2 * bs, Wp - 2 * fx * bs
    By, Bx = H // bs, W // bs
    specs, nx = _views(bs, fx, C)
    mv_flat = jnp.stack([mv_y_pad, mv_x_pad], axis=1).reshape(-1)
    grid = (P, By, Bx // fx)
    return pl.pallas_call(
        partial(_update_kernel, bs=bs, C=C, fx=fx, nx=nx),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=specs,
            out_specs=pl.BlockSpec(
                (1, C, bs, fx * bs), lambda p, i, j, *_: (p, 0, i, j),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((C * 3 * bs, nx * fx * bs), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((P, C, H, W), jnp.int32),
    )(mv_flat, *([contrib_pad] * (3 * nx)))
