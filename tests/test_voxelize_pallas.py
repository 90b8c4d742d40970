"""Pallas parity kernel vs the counting oracle — the "dual path" equality
check (SURVEY.md section 4): identical per-triangle tests, independent
reductions, bit-exact agreement required."""

import jax.numpy as jnp
import numpy as np
import pytest

from dxrvoxelizer_tpu.ops.packing import pack_bits_z, unpack_bits_z
from dxrvoxelizer_tpu.ops.voxelize_pallas import (
    voxelize_parity_bruteforce,
)
from dxrvoxelizer_tpu.ops.voxelize_ref import voxelize_parity_ref
from tests.meshes import box_mesh, tetrahedron_mesh

N = 32  # smallest tile-aligned grid


def _check(verts, tris, n=N):
    occ_ref = np.asarray(
        voxelize_parity_ref(jnp.asarray(verts), jnp.asarray(tris), n=n)
    )
    words = voxelize_parity_bruteforce(
        jnp.asarray(verts), jnp.asarray(tris), n=n, k_chunk=64, interpret=True
    )
    occ = np.asarray(unpack_bits_z(words, n))
    np.testing.assert_array_equal(occ, occ_ref)
    return occ


def test_kernel_matches_oracle_box():
    verts, _, tris = box_mesh([-0.52, 0.07, -0.73], [0.31, 0.81, 0.22])
    occ = _check(verts, tris)
    assert occ.any()


def test_kernel_matches_oracle_tet():
    verts, _, tris = tetrahedron_mesh()
    occ = _check(verts, tris)
    assert occ.any()


def test_kernel_matches_oracle_64():
    verts, _, tris = tetrahedron_mesh()
    occ = _check(verts, tris, n=64)
    assert occ.any()


def test_kernel_empty():
    verts, _, tris = box_mesh([4.0, 4.0, 4.0], [5.0, 5.0, 5.0])
    occ = _check(verts, tris)
    assert not occ.any()


def test_pack_unpack_roundtrip():
    rng = np.random.default_rng(0)
    occ = rng.random((32, 32, 32)) > 0.5
    words = pack_bits_z(jnp.asarray(occ))
    back = np.asarray(unpack_bits_z(words, 32))
    np.testing.assert_array_equal(back, occ)


@pytest.mark.parametrize("n", [32, 64])
def test_two_meshes_union_parity(n):
    # parity voxelization of two disjoint solids == union of the separate runs
    v1, _, t1 = box_mesh([-0.9, -0.9, -0.9], [-0.1, -0.2, -0.3])
    v2, _, t2 = box_mesh([0.2, 0.1, 0.05], [0.8, 0.75, 0.9])
    v = np.concatenate([v1, v2])
    t = np.concatenate([t1, t2 + len(v1)])
    both = _check(v, t, n=n)
    a = np.asarray(
        unpack_bits_z(
            voxelize_parity_bruteforce(
                jnp.asarray(v1), jnp.asarray(t1), n=n, k_chunk=64, interpret=True
            ),
            n,
        )
    )
    b = np.asarray(
        unpack_bits_z(
            voxelize_parity_bruteforce(
                jnp.asarray(v2), jnp.asarray(t2), n=n, k_chunk=64, interpret=True
            ),
            n,
        )
    )
    np.testing.assert_array_equal(both, a | b)
