"""Fused shear-warp MARCH kernel: per-slab warp + compositing in one
streaming Pallas pass.

The XLA shear-warp (ops/raymarch_warp._shearwarp_core) materializes, in
HBM, the z-supersampled slabs, BOTH warped volumes ([KS, M, M] density
and light), and re-reads them in the compositing scan — ~3.3 GB of
traffic for the -hq 256^3 frame (ss=2: KS = 512), which made the
supersampled march bandwidth-bound (~7.4 ms measured round 5,
insensitive to matmul precision and scan blocking).

This kernel streams each source slab from HBM exactly once per sub-slab
and keeps EVERYTHING else in VMEM: the z-mix of the two source slabs,
the two warp matmuls (MXU dots, [M, N] @ [N, N] and a contraction over
N), and the front-to-back transmittance/scatter update on a resident
[M, M] accumulator pair. HBM traffic collapses to
slabs (x2 at ss > 1) + warp matrices + two [M, M] outputs.

Semantics: the per-sub-slab arithmetic is the XLA path's, expression for
expression (same z-mix weights, same att/σ/early-out chains — see
`_shearwarp_core`'s scan body); the only numerical difference is the
warp matmuls' implementation (Mosaic f32 dots vs XLA `precision=highest`
einsums), which moves images by ulp-level amounts — pinned on CPU
(interpret mode is bit-exact vs the XLA path's own CPU run, where both
are true f32 matmuls: tests/test_march_pallas.py) and bounded on TPU by
the golden-image tests.

Reference anchor: this is the production implementation of
PSRayCast.hlsl:117-187's march loop (128 steps x trilinear SampleLevel
with early-out), restructured slab-major for the MXU.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dxrvoxelizer_tpu.ops.raymarch_ref import ABSORPTION, ZERO_THRESHOLD


def _march_kernel(*refs, ss: int):
    if ss == 1:
        (w_ref, f_ref, s0_ref, wx_ref, wy_ref, delta_ref,
         t_out, s_out, acc_t, acc_s) = refs
        s1_ref = None
    else:
        (w_ref, f_ref, s0_ref, s1_ref, wx_ref, wy_ref, delta_ref,
         t_out, s_out, acc_t, acc_s) = refs
    k = pl.program_id(0)
    nsteps = pl.num_programs(0)

    @pl.when(k == 0)
    def _():
        acc_t[...] = jnp.ones_like(acc_t)
        acc_s[...] = jnp.zeros_like(acc_s)

    # z-mix of the two source-slab windows (ss=1: the windows coincide
    # and w == 0, so dmix == the slab itself — same expression, no branch)
    w = w_ref[k, 0]
    d0, l0 = s0_ref[0, 0], s0_ref[1, 0]
    if ss == 1:
        dmix, lmix = d0, l0
    else:
        d1, l1 = s1_ref[0, 0], s1_ref[1, 0]
        dmix = d0 * (1.0 - w) + d1 * w
        lmix = l0 * (1.0 - w) + l1 * w

    # the two warp contractions on the MXU: [M, N] @ [N, N] then a
    # contraction over N with wy ([M, N]) -> [M, M]
    wx = wx_ref[0]
    wy = wy_ref[0]
    dims = (((1,), (0,)), ((), ()))
    dimsT = (((1,), (1,)), ((), ()))
    d_t = jax.lax.dot_general(wx, dmix, dims,
                              preferred_element_type=jnp.float32)
    d_w = jax.lax.dot_general(d_t, wy, dimsT,
                              preferred_element_type=jnp.float32)
    l_t = jax.lax.dot_general(wx, lmix, dims,
                              preferred_element_type=jnp.float32)
    l_w = jax.lax.dot_general(l_t, wy, dimsT,
                              preferred_element_type=jnp.float32)

    # compositing update — verbatim the XLA scan body's expressions
    f_k = f_ref[k, 0]
    delta = delta_ref[...]
    g_s = jnp.minimum(d_w * 8.0, 16.0)
    occupied = (g_s > ZERO_THRESHOLD) & (f_k > 0)
    sigma = g_s * delta
    att = jnp.where(occupied, jnp.clip(1.0 - sigma * ABSORPTION, 0.0, 1.0),
                    1.0)
    transmit = acc_t[...]
    new_transmit = transmit * att
    contributes = occupied & (new_transmit >= ZERO_THRESHOLD)
    acc_s[...] = acc_s[...] + jnp.where(
        contributes, l_w * new_transmit * sigma, 0.0
    )
    acc_t[...] = jnp.where(transmit >= ZERO_THRESHOLD, new_transmit,
                           transmit)

    @pl.when(k == nsteps - 1)
    def _():
        t_out[...] = acc_t[...]
        s_out[...] = acc_s[...]


@partial(jax.jit, static_argnames=("ss", "interpret"))
def march_pallas(
    slabs: jnp.ndarray,   # [2, K, N, N] f32 (density, light), far axis K
    wts: jnp.ndarray,     # [KS] f32 sub-slab z-mix weights
    front: jnp.ndarray,   # [KS] f32 near-clip mask (0/1)
    wx: jnp.ndarray,      # [KS, M, N] f32 x-warp matrices
    wy: jnp.ndarray,      # [KS, M, N] f32 y-warp matrices
    delta: jnp.ndarray,   # [M, M] f32 per-pixel step lengths
    ss: int,
    interpret: bool = False,
):
    """Fused march -> (transmit [M, M], scatter [M, M]).

    Sub-slab s (of KS = K * ss) z-mixes source slabs i0(s) and i1(s)
    with weight ``wts[s]`` (the XLA path's `pos = (s+0.5)/ss - 0.5`
    CLAMPed indexing); ss == 1 reads each slab directly."""
    _two, kn, n, _n2 = slabs.shape
    ks, m, _ = wx.shape
    assert ks == kn * ss and wx.shape == wy.shape

    def i0(s):
        if ss == 1:
            return s
        # floor((s + 0.5)/ss - 0.5) clipped to [0, K-1]; integer form:
        # (2s + 1 - ss) // (2ss) for the non-negative branch
        return jnp.clip((2 * s + 1 - ss) // (2 * ss), 0, kn - 1)

    def i1(s):
        if ss == 1:
            return s
        return jnp.clip(i0(s) + 1, 0, kn - 1)

    in_specs = [
        # whole [KS, 1] arrays resident in SMEM (bytes); the kernel
        # indexes by program id — per-step rank-1/2 SMEM blocks hit
        # Mosaic's (8, 128) divisibility rule
        pl.BlockSpec((ks, 1), lambda s: (0, 0),
                     memory_space=pltpu.SMEM),  # wts
        pl.BlockSpec((ks, 1), lambda s: (0, 0),
                     memory_space=pltpu.SMEM),  # front
        pl.BlockSpec((2, 1, n, n), lambda s: (0, i0(s), 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    if ss > 1:  # ss=1 reads each slab once — no second window operand
        in_specs.append(
            pl.BlockSpec((2, 1, n, n), lambda s: (0, i1(s), 0, 0),
                         memory_space=pltpu.VMEM)
        )
    in_specs += [
        pl.BlockSpec((1, m, n), lambda s: (s, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, m, n), lambda s: (s, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((m, m), lambda s: (0, 0), memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((m, m), lambda s: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((m, m), lambda s: (0, 0), memory_space=pltpu.VMEM),
    ]
    t_i, s_i = pl.pallas_call(
        partial(_march_kernel, ss=ss),
        grid=(ks,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=[
            jax.ShapeDtypeStruct((m, m), jnp.float32),
            jax.ShapeDtypeStruct((m, m), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((m, m), jnp.float32),
            pltpu.VMEM((m, m), jnp.float32),
        ],
        interpret=interpret,
    )(wts.reshape(ks, 1), front.reshape(ks, 1),
      *((slabs,) if ss == 1 else (slabs, slabs)), wx, wy, delta)
    return t_i, s_i
