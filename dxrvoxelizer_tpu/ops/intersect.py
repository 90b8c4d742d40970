"""Batched ray-triangle intersection primitives (jax.numpy).

The TPU replacement for DXR's fixed-function ``TraceRay`` BVH traversal
(reference: DXRVoxelizer.hlsl:80): a no-culling Moller-Trumbore test over
triangle chunks with a running closest-hit reduction. Everything is static
shapes + ``lax.scan`` so XLA tiles the arithmetic onto the VPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS_DET = 1e-10
T_MAX = 1e4  # ray.TMax (DXRVoxelizer.hlsl:77)


def triangle_soup(verts: jnp.ndarray, tris: jnp.ndarray):
    """Gather (v0, e1, e2) triangle soup from indexed buffers."""
    v0 = verts[tris[:, 0]]
    v1 = verts[tris[:, 1]]
    v2 = verts[tris[:, 2]]
    return v0, v1 - v0, v2 - v0


def mt_hit(o, d, v0, e1, e2):
    """Moller-Trumbore test, broadcasting over leading dims -> (t, u, v, hit).

    ``o``/``d`` and ``v0``/``e1``/``e2`` must already be broadcast-compatible
    on their leading axes (last axis = xyz). No backface culling; t >= 0
    (TMin = 0, TMax = 1e4, DXRVoxelizer.hlsl:76-77). t = +inf on miss.

    Every implementation (the oracle's brute-force scan, the binned XLA
    query, and the Pallas streaming kernel ops/raystab_pallas.py) shares
    this exact SCALARIZED expression sequence — component-wise cross/dot
    expansions, not jnp.cross/sum — so closest-hit results agree
    bit-for-bit even on boundary-exact hits where a different
    fused-multiply-add contraction would flip a comparison.
    """
    ox, oy, oz = o[..., 0], o[..., 1], o[..., 2]
    dx, dy, dz = d[..., 0], d[..., 1], d[..., 2]
    v0x, v0y, v0z = v0[..., 0], v0[..., 1], v0[..., 2]
    e1x, e1y, e1z = e1[..., 0], e1[..., 1], e1[..., 2]
    e2x, e2y, e2z = e2[..., 0], e2[..., 1], e2[..., 2]

    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    inv_det = jnp.where(jnp.abs(det) > EPS_DET, 1.0 / det, 0.0)
    tvx = ox - v0x
    tvy = oy - v0y
    tvz = oz - v0z
    u = (tvx * px + tvy * py + tvz * pz) * inv_det
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    hit = (
        (jnp.abs(det) > EPS_DET)
        & (u >= 0.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t >= 0.0)
        & (t <= T_MAX)
    )
    t = jnp.where(hit, t, jnp.inf)
    return t, u, v, hit


def _closest_hit_chunk(origins, dirs, v0, e1, e2, tri_offset):
    """Closest hit of rays [R,3] against one triangle chunk [Tc,3].

    Returns (t, u, v, idx) per ray, with idx global (tri_offset added) and
    t = +inf on miss.
    """
    # [R, 1, 3] x [1, Tc, 3]
    t, u, v, _ = mt_hit(
        origins[:, None, :], dirs[:, None, :],
        v0[None, :, :], e1[None, :, :], e2[None, :, :],
    )
    # closest hit in the chunk; ties resolved to the lowest triangle index
    best = jnp.argmin(t, axis=1)
    r = jnp.arange(t.shape[0])
    return t[r, best], u[r, best], v[r, best], best + tri_offset


def closest_hit(origins, dirs, v0, e1, e2, tri_chunk: int = 2048):
    """Closest hit over the whole soup, scanning triangle chunks.

    Returns (t, u, v, tri_idx); t = +inf where the ray misses everything.
    """
    num_tris = v0.shape[0]
    pad = (-num_tris) % tri_chunk
    if pad:
        # degenerate padding triangles never hit (det == 0)
        z = jnp.zeros((pad, 3), dtype=v0.dtype)
        v0 = jnp.concatenate([v0, z])
        e1 = jnp.concatenate([e1, z])
        e2 = jnp.concatenate([e2, z])
    n_chunks = v0.shape[0] // tri_chunk
    v0c = v0.reshape(n_chunks, tri_chunk, 3)
    e1c = e1.reshape(n_chunks, tri_chunk, 3)
    e2c = e2.reshape(n_chunks, tri_chunk, 3)

    r = origins.shape[0]
    init = (
        jnp.full((r,), jnp.inf, dtype=origins.dtype),
        jnp.zeros((r,), dtype=origins.dtype),
        jnp.zeros((r,), dtype=origins.dtype),
        jnp.zeros((r,), dtype=jnp.int32),
    )

    def body(carry, chunk):
        bt, bu, bv, bi = carry
        cv0, ce1, ce2, off = chunk
        t, u, v, i = _closest_hit_chunk(origins, dirs, cv0, ce1, ce2, off)
        # strictly-closer wins; equal t keeps the earlier (lower-index) hit
        take = t < bt
        return (
            jnp.where(take, t, bt),
            jnp.where(take, u, bu),
            jnp.where(take, v, bv),
            jnp.where(take, i.astype(jnp.int32), bi),
        ), None

    offsets = jnp.arange(n_chunks, dtype=jnp.int32) * tri_chunk
    (bt, bu, bv, bi), _ = jax.lax.scan(body, init, (v0c, e1c, e2c, offsets))
    return bt, bu, bv, bi
