"""Pallas screen-resolve kernel: coherent bilinear reads of the intermediate.

The shear-warp renderer's only irregular access is one bilinear sample per
screen pixel from the (M, M) intermediate images. XLA's gather runs at
~1e8 taps/s on TPU — far too slow — but this access is *coherent*:
neighbouring pixels read neighbouring texels. The kernel exploits it:

- the whole intermediate lives in VMEM (M = 128 -> 64 KB per channel);
- each program resolves a (8, 128) pixel tile; the tile's source rows span a
  small window, so a 16-row dynamic slice + per-row lane-shuffles
  (``take_along_axis`` along lanes — the one vector gather Mosaic lowers
  natively) + row-select reconstruct an arbitrary 2D bilinear fetch in a few
  hundred VPU ops per 1024 pixels.

Row windows are clamped: a screen tile whose rows span more than 16
intermediate rows (possible only when the whole volume is < ~64 px tall on
screen) resolves with edge clamping.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M_BUCKETS = (128, 256, 512)  # supported intermediate resolutions
M_SUPPORTED = 128  # smallest bucket (kept for callers that pad up to it)
# Row window per tile: the resolver chooses the intermediate orientation so
# rows track screen-y (raymarch_warp host logic); 32 covers rolled cameras.
WIN = 32


TILES_PER_STEP = 8  # pixel tiles per grid step (amortizes step plumbing)


def _resolve_kernel(
    sc_ref, tr_ref, gx_ref, gy_ref, mask_ref, osc_ref, otr_ref, *, m: int,
    win: int,
):
    for b in range(TILES_PER_STEP):
        mask = mask_ref[b] > 0  # lanes whose result is consumed
        any_hit = jnp.sum(mask_ref[b]) > 0

        @pl.when(jnp.logical_not(any_hit))
        def _(b=b):
            # pure-background tile (most of a 1080p frame): nothing to do
            osc_ref[b] = jnp.zeros_like(osc_ref[b])
            otr_ref[b] = jnp.ones_like(otr_ref[b])

        @pl.when(any_hit)
        def _(b=b, mask=mask):
            gx = gx_ref[b]  # (8,128) source row coordinate (intermediate x)
            gy = gy_ref[b]  # (8,128) source column coordinate
            x0 = jnp.clip(jnp.floor(gx).astype(jnp.int32), 0, m - 1)
            x1 = jnp.clip(x0 + 1, 0, m - 1)
            y0 = jnp.clip(jnp.floor(gy).astype(jnp.int32), 0, m - 1)
            y1 = jnp.clip(y0 + 1, 0, m - 1)
            # fractions from the *clamped* base texel (edge-clamp semantics)
            fx = jnp.clip(gx - x0.astype(jnp.float32), 0.0, 1.0)
            fy = jnp.clip(gy - y0.astype(jnp.float32), 0.0, 1.0)

            # window from consumed lanes only (misses may point anywhere);
            # the start is floored to a sublane multiple (Mosaic requires a
            # provably 8-aligned dynamic offset for wide-row vector loads),
            # which costs up to 7 rows of the window — the win selection
            # formula budgets for it
            rmin = jnp.clip(jnp.min(jnp.where(mask, x0, m - 1)), 0, m - win)
            rmin = pl.multiple_of((rmin // 8) * 8, 8)
            rr0 = jnp.clip(x0 - rmin, 0, win - 1)
            rr1 = jnp.clip(x1 - rmin, 0, win - 1)

            # Mosaic's native lane gather (take_along_axis) needs the
            # source row to match the 128-lane index width, so rows wider
            # than 128 texels (m = 256/512 intermediates) gather per
            # 128-lane segment with a segment-select
            segs = m // 128
            ys0 = y0 >> 7
            ys1 = y1 >> 7
            yl0 = y0 & 127
            yl1 = y1 & 127

            def sample(img_ref):
                w = img_ref[pl.ds(rmin, win), :]  # (win, m)
                zero = jnp.zeros(gx.shape, jnp.float32)
                v00 = v01 = v10 = v11 = zero
                for k in range(win):
                    for sg in range(segs):
                        rowb = jnp.broadcast_to(
                            w[k : k + 1, sg * 128 : (sg + 1) * 128],
                            gx.shape,
                        )
                        g0 = jnp.take_along_axis(rowb, yl0, axis=1)
                        g1 = jnp.take_along_axis(rowb, yl1, axis=1)
                        s0 = (rr0 == k) & (ys0 == sg)
                        s1 = (rr1 == k) & (ys0 == sg)
                        t0 = (rr0 == k) & (ys1 == sg)
                        t1 = (rr1 == k) & (ys1 == sg)
                        v00 = jnp.where(s0, g0, v00)
                        v10 = jnp.where(s1, g0, v10)
                        v01 = jnp.where(t0, g1, v01)
                        v11 = jnp.where(t1, g1, v11)
                return (
                    v00 * (1 - fx) * (1 - fy)
                    + v10 * fx * (1 - fy)
                    + v01 * (1 - fx) * fy
                    + v11 * fx * fy
                )

            osc_ref[b] = sample(sc_ref)
            otr_ref[b] = sample(tr_ref)


@partial(jax.jit, static_argnames=("win", "interpret"))
def bilinear_resolve(
    scatter_i: jnp.ndarray,
    transmit_i: jnp.ndarray,
    gi_x: jnp.ndarray,
    gi_y: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    win: int = WIN,
    interpret: bool = False,
):
    """Bilinear-sample both intermediates at (gi_x, gi_y) -> (sc, tr) [P].

    ``mask``: lanes whose results are consumed (miss pixels excluded from the
    coherence-window computation; their outputs are garbage). ``win`` is the
    static per-tile row window; callers may halve it when the magnification
    bound proves a 32x32-pixel tile can't span more rows.
    """
    m = scatter_i.shape[0]
    assert m in M_BUCKETS, f"pallas resolve supports M in {M_BUCKETS}, got {m}"
    p = gi_x.shape[0]
    pad = (-p) % (1024 * TILES_PER_STEP)
    if mask is None:
        mask = jnp.ones((p,), jnp.int32)
    # edge-pad: zero-padding would break the last tile's row coherence
    gx = jnp.pad(gi_x, (0, pad), mode="edge")
    gy = jnp.pad(gi_y, (0, pad), mode="edge")
    mk = jnp.pad(mask.astype(jnp.int32), (0, pad))
    tiles = (p + pad) // 1024
    gx = gx.reshape(tiles, 8, 128)
    gy = gy.reshape(tiles, 8, 128)
    mk = mk.reshape(tiles, 8, 128)
    ts = TILES_PER_STEP

    sc, tr = pl.pallas_call(
        partial(_resolve_kernel, m=m, win=win),
        grid=(tiles // ts,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # scatter (full)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # transmit (full)
            pl.BlockSpec((ts, 8, 128), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 8, 128), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 8, 128), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((ts, 8, 128), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((ts, 8, 128), lambda t: (t, 0, 0), memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tiles, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((tiles, 8, 128), jnp.float32),
        ),
        interpret=interpret,
    )(scatter_i, transmit_i, gx, gy, mk)
    return sc.reshape(-1)[:p], tr.reshape(-1)[:p]
