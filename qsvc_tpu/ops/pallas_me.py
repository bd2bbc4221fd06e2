"""Pallas TPU kernel for the block-matching spiral SAD refinement.

One refinement level of the hierarchical motion estimation
(``motion_estimate.cpp:70-225``, FAST_SEARCH): every block evaluates the
9-point spiral around its current (PREV, NEXT) vectors — probes applied
anti-symmetrically (PREV +d, NEXT -d) — and keeps the later probe on SAD
ties, exactly the semantics of ``mctf/me.py::_refine_level``.

The XLA formulation materializes per-block ``(win+2, win+2)`` patch
gathers (three per direction per level); here the patches never touch
HBM: the 3x3 block neighbourhood of each reference is staged into VMEM
(the same shifted-views trick as ``pallas_mc.py`` — BlockSpec index maps
cannot express overlapping windows), the motion shift becomes an in-VMEM
``pltpu.roll`` pair, the 9 probes are static slices of the rolled
window, and only the 4 winning offsets per block are written out.

Constraints (see :func:`supported`; callers fall back to the lax path):
``border_size == 0``, ``search_range < block_size``, ``block_size`` a
multiple of 8 with ``4*block_size`` a multiple of 128 (the dynamic lane
rotate needs a 128-multiple window).  The caller edge-pads the active
``(ny, nx)`` region to the block grid plus a ``block_size`` margin —
identical to the XLA path's clamped reads (``me.py::_padded_active``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# spiral order: later probes win ties; (0,0) last (motion_estimate.cpp:124-174)
SPIRAL = ((-1, -1), (-1, 1), (1, -1), (1, 1),
          (-1, 0), (1, 0), (0, 1), (0, -1), (0, 0))


def _fx(bs: int) -> int:
    return max(1, 128 // bs)


def supported(block_size: int, border: int, max_mv: int) -> bool:
    bs = block_size
    return (border == 0 and max_mv + 1 <= bs and bs % 8 == 0
            and (4 * bs) % 128 == 0)


def _views(bs: int, fx: int):
    specs = []
    for dy in range(3):
        for dxv in range(3):
            specs.append(pl.BlockSpec(
                (1, bs, fx * bs),
                lambda p, i, j, *_, dy=dy, dxv=dxv: (p, i + dy, j + dxv),
                memory_space=pltpu.VMEM))
    return specs


def _assemble(scratch, refs, bs: int, fx: int):
    w = fx * bs
    for dy in range(3):
        for dxv in range(3):
            scratch[dy * bs:(dy + 1) * bs, dxv * w:(dxv + 1) * w] = \
                refs[dy * 3 + dxv][0].astype(jnp.int32)


def _norm(s, n: int):
    return jnp.where(s < 0, s + n, s)


def _refine_kernel(mv_ref, *args, bs: int, fx: int, Lp: int):
    pred_v = args[0]
    refs_p = args[1:10]
    refs_n = args[10:19]
    out_ref, scr_p, scr_n = args[19], args[20], args[21]
    p = pl.program_id(0)
    i = pl.program_id(1)
    j = pl.program_id(2)
    nby = pl.num_programs(1)
    nbx = pl.num_programs(2) * fx
    _assemble(scr_p, refs_p, bs, fx)
    _assemble(scr_n, refs_n, bs, fx)
    R = 3 * bs
    nb = nby * nbx
    By = out_ref.shape[2]
    rows3 = jax.lax.broadcasted_iota(jnp.int32, (4, By, Lp), 1)
    lanes3 = jax.lax.broadcasted_iota(jnp.int32, (4, By, Lp), 2)
    for s in range(fx):
        jj = j * fx + s
        base = (p * 4) * nb + i * nbx + jj
        mvy_p = mv_ref[base]
        mvx_p = mv_ref[base + nb]
        mvy_n = mv_ref[base + 2 * nb]
        mvx_n = mv_ref[base + 3 * nb]
        # 4*bs-wide window centred on sub-block s (lane0 = bs)
        win_p = scr_p[:, (s + fx - 1) * bs:(s + fx + 3) * bs]
        win_n = scr_n[:, (s + fx - 1) * bs:(s + fx + 3) * bs]
        Wn = 4 * bs
        lane0 = bs
        rp = pltpu.roll(pltpu.roll(win_p, _norm(-mvy_p, R), 0),
                        _norm(-mvx_p, Wn), 1)
        rn = pltpu.roll(pltpu.roll(win_n, _norm(-mvy_n, R), 0),
                        _norm(-mvx_n, Wn), 1)
        predb = pred_v[0, :, s * bs:(s + 1) * bs].astype(jnp.int32)

        neg = jnp.int32(jnp.iinfo(jnp.int32).max)
        best_e_p = neg
        best_e_n = neg
        bdy_p = jnp.int32(0)
        bdx_p = jnp.int32(0)
        bdy_n = jnp.int32(0)
        bdx_n = jnp.int32(0)
        for dy, dx in SPIRAL:
            sl_p = rp[bs + dy:2 * bs + dy, lane0 + dx:lane0 + dx + bs]
            sl_n = rn[bs - dy:2 * bs - dy, lane0 - dx:lane0 - dx + bs]
            e_p = jnp.sum(jnp.abs(predb - sl_p))
            e_n = jnp.sum(jnp.abs(predb - sl_n))
            tk_p = e_p <= best_e_p          # later probe wins ties
            tk_n = e_n <= best_e_n
            best_e_p = jnp.where(tk_p, e_p, best_e_p)
            best_e_n = jnp.where(tk_n, e_n, best_e_n)
            bdy_p = jnp.where(tk_p, jnp.int32(dy), bdy_p)
            bdx_p = jnp.where(tk_p, jnp.int32(dx), bdx_p)
            bdy_n = jnp.where(tk_n, jnp.int32(-dy), bdy_n)
            bdx_n = jnp.where(tk_n, jnp.int32(-dx), bdx_n)

        # masked RMW of (row i, lane jj) in the revisited per-p out block
        # (the block covers the full (4, By, Lp) plane — Mosaic requires
        # the last two block dims be full or (8, 128)-aligned, and a
        # dynamic sublane store at i would need provable alignment)
        cur = out_ref[0]
        vals = jnp.stack([jnp.full((By, Lp), bdy_p, jnp.int32),
                          jnp.full((By, Lp), bdx_p, jnp.int32),
                          jnp.full((By, Lp), bdy_n, jnp.int32),
                          jnp.full((By, Lp), bdx_n, jnp.int32)])
        out_ref[0] = jnp.where((rows3 == i) & (lanes3 == jj), vals, cur)


@partial(jax.jit, static_argnames=("block_size",))
def refine_pallas(pred_pad: jnp.ndarray, prev_pad: jnp.ndarray,
                  next_pad: jnp.ndarray, mv: jnp.ndarray,
                  block_size: int) -> jnp.ndarray:
    """One spiral refinement of all blocks of all frame pairs.

    ``pred_pad``/``prev_pad``/``next_pad``: (P, By*bs + 2bs,
    Bx'*bs + 2*fx*bs) int32, edge-replicated from the active region
    (Bx' = Bx padded to a multiple of fx); ``mv``: (P, 2, 2, By, Bx')
    int32 with |mv| < bs.  Returns (P, 4, By, Lp) int32 probe deltas
    ``[dy_prev, dx_prev, dy_next, dx_next]`` with Lp = 128 lanes (slice
    ``[..., :Bx]``).
    """
    bs = block_size
    fx = _fx(bs)
    P, Hp, Wp = pred_pad.shape
    H, W = Hp - 2 * bs, Wp - 2 * fx * bs
    By, Bx = H // bs, W // bs
    Lp = 128
    assert Bx % fx == 0 and Bx <= Lp, (Bx, fx)
    pred_spec = pl.BlockSpec((1, bs, fx * bs),
                             lambda p, i, j, *_: (p, i + 1, j + 1),
                             memory_space=pltpu.VMEM)
    grid = (P, By, Bx // fx)
    return pl.pallas_call(
        partial(_refine_kernel, bs=bs, fx=fx, Lp=Lp),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[pred_spec] + _views(bs, fx) + _views(bs, fx),
            out_specs=pl.BlockSpec(
                (1, 4, By, Lp), lambda p, i, j, *_: (p, 0, 0, 0),
                memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((3 * bs, 3 * fx * bs), jnp.int32),
                pltpu.VMEM((3 * bs, 3 * fx * bs), jnp.int32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((P, 4, By, Lp), jnp.int32),
    )(mv.reshape(-1), pred_pad, *([prev_pad] * 9), *([next_pad] * 9))
