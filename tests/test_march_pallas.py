"""Fused Pallas march kernel (ops/march_pallas.py) vs the XLA shear-warp
march: same z-mix + warp + compositing semantics on the same inputs."""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from dxrvoxelizer_tpu.ops.march_pallas import march_pallas
from dxrvoxelizer_tpu.ops.raymarch_ref import ABSORPTION, ZERO_THRESHOLD
from dxrvoxelizer_tpu.ops.warp import warp2d


def _xla_march(slabs, wts, front, wx, wy, delta, ss):
    """The XLA reference: raymarch_warp._shearwarp_core's z-lerp +
    warp2d + scan body, expression for expression."""
    n = slabs.shape[1]
    ks = n * ss
    if ss > 1:
        pos = (jnp.arange(ks, dtype=jnp.float32) + 0.5) / ss - 0.5
        i0 = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 1)
        i1 = jnp.clip(i0 + 1, 0, n - 1)
        w1 = wts
        slabs = (
            slabs[:, i0] * (1.0 - w1)[None, :, None, None]
            + slabs[:, i1] * w1[None, :, None, None]
        )
    dens_w = warp2d(slabs[0], wx, wy)
    light_w = warp2d(slabs[1], wx, wy)

    def body(carry, xs):
        transmit, scatter = carry
        d_k, l_k, f_k = xs
        g_s = jnp.minimum(d_k * 8.0, 16.0)
        occupied = (g_s > ZERO_THRESHOLD) & (f_k > 0)
        sigma = g_s * delta
        att = jnp.where(
            occupied, jnp.clip(1.0 - sigma * ABSORPTION, 0.0, 1.0), 1.0
        )
        new_transmit = transmit * att
        contributes = occupied & (new_transmit >= ZERO_THRESHOLD)
        scatter = scatter + jnp.where(
            contributes, l_k * new_transmit * sigma, 0.0
        )
        transmit = jnp.where(
            transmit >= ZERO_THRESHOLD, new_transmit, transmit
        )
        return (transmit, scatter), None

    m = wx.shape[1]
    init = (jnp.ones((m, m), jnp.float32), jnp.zeros((m, m), jnp.float32))
    (t_i, s_i), _ = jax.lax.scan(body, init, (dens_w, light_w, front))
    return t_i, s_i


@pytest.mark.parametrize("ss", [1, 2])
def test_march_kernel_matches_xla(ss):
    rng = np.random.default_rng(7)
    n, m = 32, 32
    ks = n * ss
    slabs = jnp.asarray(
        (rng.random((2, n, n, n)) < 0.15).astype(np.float32)
        * rng.random((2, n, n, n)).astype(np.float32)
    )
    pos = (np.arange(ks, dtype=np.float32) + 0.5) / ss - 0.5
    i0 = np.clip(np.floor(pos).astype(np.int32), 0, n - 1)
    wts = jnp.asarray(np.clip(pos - i0, 0.0, 1.0).astype(np.float32))
    front = jnp.asarray(
        (rng.random(ks) > 0.1).astype(np.float32)
    )
    # bilinear-ish random warp rows (2 nonzeros, sums <= 1)
    wx = jnp.asarray(rng.random((ks, m, n)).astype(np.float32) * 0.02)
    wy = jnp.asarray(rng.random((ks, m, n)).astype(np.float32) * 0.02)
    delta = jnp.asarray(
        (0.02 + 0.01 * rng.random((m, m))).astype(np.float32)
    )
    t_ref, s_ref = _xla_march(slabs, wts, front, wx, wy, delta, ss)
    t_k, s_k = march_pallas(slabs, wts, front, wx, wy, delta, ss,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_ref),
                               rtol=0.0, atol=2e-6)
    np.testing.assert_allclose(np.asarray(s_k), np.asarray(s_ref),
                               rtol=0.0, atol=2e-6)
