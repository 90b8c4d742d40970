"""Binned voxelization path vs oracle — binning must never change the result
(including the overflow path for tiles-spanning triangles)."""

import jax.numpy as jnp
import numpy as np

from dxrvoxelizer_tpu.ops.binning import bin_triangles, voxelize_parity_binned
from dxrvoxelizer_tpu.ops.packing import unpack_bits_z
from dxrvoxelizer_tpu.ops.voxelize_ref import voxelize_parity_ref
from tests.meshes import box_mesh, tetrahedron_mesh


def _check(verts, tris, n, **kw):
    occ_ref = np.asarray(
        voxelize_parity_ref(jnp.asarray(verts), jnp.asarray(tris), n=n)
    )
    words = voxelize_parity_binned(
        jnp.asarray(verts), jnp.asarray(tris), n=n, interpret=True, **kw
    )
    occ = np.asarray(unpack_bits_z(words, n))
    np.testing.assert_array_equal(occ, occ_ref)
    return occ


def test_binned_matches_oracle_tet():
    verts, _, tris = tetrahedron_mesh()
    assert _check(verts, tris, 64).any()


def test_binned_matches_oracle_box_64():
    verts, _, tris = box_mesh([-0.52, 0.07, -0.73], [0.31, 0.81, 0.22])
    assert _check(verts, tris, 64).any()


def test_overflow_path_big_triangles():
    # a giant quad spanning the whole grid forces the overflow route
    verts, _, tris = box_mesh([-0.95, -0.95, -0.95], [0.95, 0.95, 0.95])
    _, stats = bin_triangles(jnp.asarray(verts), jnp.asarray(tris), 64, max_span=1)
    assert stats.overflow > 0
    occ_ref = np.asarray(
        voxelize_parity_ref(jnp.asarray(verts), jnp.asarray(tris), n=64)
    )
    words = voxelize_parity_binned(
        jnp.asarray(verts), jnp.asarray(tris), n=64, max_span=1, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(unpack_bits_z(words, 64)), occ_ref)


def test_static_binned_voxelizer_matches():
    """Build-once StaticBinnedVoxelizer == the per-call binned path (the
    64^3 static-mesh AS-reuse split)."""
    from dxrvoxelizer_tpu.ops.binning import StaticBinnedVoxelizer

    verts, _, tris = box_mesh([-0.52, 0.07, -0.73], [0.31, 0.81, 0.22])
    v, t = jnp.asarray(verts), jnp.asarray(tris)
    want = np.asarray(voxelize_parity_binned(v, t, n=64, interpret=True))
    sv = StaticBinnedVoxelizer(v, t, 64, interpret=True)
    np.testing.assert_array_equal(np.asarray(sv()), want)
    np.testing.assert_array_equal(
        np.asarray(sv(perturb=jnp.float32(2.0))), want
    )


def test_bin_stats_reasonable():
    verts, _, tris = tetrahedron_mesh()
    coef_tiles, stats = bin_triangles(jnp.asarray(verts), jnp.asarray(tris), 64)
    assert coef_tiles.shape == (stats.n_tiles, stats.capacity, 16)
    assert stats.n_tiles == 4
    # capacity is a power of two
    assert stats.capacity & (stats.capacity - 1) == 0
