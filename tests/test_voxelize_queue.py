"""Work-queue Pallas kernel vs the jnp oracle (interpret mode on CPU).

The queue kernel (ops/voxelize_queue.py) must produce bit-identical packed
occupancy to voxelize_parity_ref — same per-triangle setup, same coverage
expressions, different reduction (XOR fold vs crossing count), mirroring the
reference's dual Core/EZ implementations (SURVEY.md section 4).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from dxrvoxelizer_tpu.ops import voxelize_queue as vq
from dxrvoxelizer_tpu.ops.packing import pack_bits_z, unpack_bits_z
from dxrvoxelizer_tpu.ops.voxelize_ref import voxelize_parity_ref
from tests.meshes import box_mesh, tetrahedron_mesh


def _cases():
    tv, _, tt = box_mesh(np.array([-0.7, -0.5, -0.3]), np.array([0.4, 0.8, 0.6]))
    sv, _, st = tetrahedron_mesh()
    return {"tet": (sv, st), "box": (tv, tt)}


@pytest.mark.parametrize("n", [64, 128])
@pytest.mark.parametrize("name", ["tet", "box"])
def test_queue_matches_oracle(name, n):
    v, t = _cases()[name]
    v = jnp.asarray(v, jnp.float32)
    t = jnp.asarray(t, jnp.int32)
    ref = pack_bits_z(voxelize_parity_ref(v, t, n=n))
    got = vq.voxelize_parity_queue(v, t, n, interpret=True)
    assert (np.asarray(ref) == np.asarray(got)).all()


def test_queue_group_split(monkeypatch):
    """Force multi-group launches (the 512^3 path) at a small grid size."""
    v, t = _cases()["tet"]
    v = jnp.asarray(v, jnp.float32)
    t = jnp.asarray(t, jnp.int32)
    n = 64
    ref = pack_bits_z(voxelize_parity_ref(v, t, n=n))
    monkeypatch.setattr(vq, "VMEM_OUT_BUDGET", 8 * 1024)  # -> several groups
    got = vq.voxelize_parity_queue(v, t, n, interpret=True)
    assert (np.asarray(ref) == np.asarray(got)).all()


def test_queue_group_split_dense_queue(monkeypatch):
    """Group boundaries must not leak neighbouring groups' triangles.

    A dense multi-chunk queue (icosphere scaled past the grid bounds) plus
    static_trip's full unroll exposed exactly that: each group's chunk
    range rounds up to 128, and the tail rows used to hold the NEXT
    groups' live coefficients, XORing phantom crossings into the group's
    last tile (4 corrupted voxels on this fixture before the fix)."""
    from meshes import icosphere_mesh

    v, _, t = icosphere_mesh(2)
    v = jnp.asarray(v, jnp.float32) * 1.07 + jnp.asarray([0.02, -0.03, 0.01])
    t = jnp.asarray(t, jnp.int32)
    n = 64
    ref = pack_bits_z(voxelize_parity_ref(v, t, n=n))
    monkeypatch.setattr(vq, "VMEM_OUT_BUDGET", 8 * 1024)
    got = vq.voxelize_parity_queue(v, t, n, interpret=True)
    assert (np.asarray(ref) == np.asarray(got)).all()


def test_queue_empty_mesh():
    out = vq.voxelize_parity_queue(
        jnp.zeros((0, 3), jnp.float32), jnp.zeros((0, 3), jnp.int32), 64
    )
    assert not unpack_bits_z(out, 64).any()


def test_queue_overflow_path():
    """A giant triangle (span > max_span) must route through overflow and
    still land in every tile it covers."""
    v, t = _cases()["box"]
    v = jnp.asarray(v, jnp.float32)
    t = jnp.asarray(t, jnp.int32)
    n = 128
    # shrink the span caps so the box faces overflow
    ref = pack_bits_z(voxelize_parity_ref(v, t, n=n))
    coefs, ct, cf, cl, stats = vq.build_queue(v, t, n, max_span_x=1, max_span_y=1)
    assert stats.overflow > 0
    got = vq.voxelize_parity_queue_run(
        coefs, np.asarray(ct), np.asarray(cf), np.asarray(cl), n,
        interpret=True,
    )
    assert (np.asarray(ref) == np.asarray(got)).all()


def test_deforming_voxelizer_device_layout():
    """The no-host-sync device queue build matches the oracle across
    deformed frames (the BASELINE deforming-mesh config)."""
    v, t = _cases()["tet"]
    v = jnp.asarray(v, jnp.float32)
    t = jnp.asarray(t, jnp.int32)
    n = 64
    from dxrvoxelizer_tpu.ops.voxelize_queue import (
        _build_queue_device, _queue_run_group, _tiles_to_grid,
    )

    for scale in (1.0, 1.05, 0.93):
        vv = v * scale
        ref = pack_bits_z(voxelize_parity_ref(vv, t, n=n))
        coefs, tile_of, nsub, last, ok = _build_queue_device(
            vv, t, n, 128, 64, 4, 8
        )
        assert bool(ok)
        out = _queue_run_group(
            coefs, tile_of, nsub, last, jnp.zeros((1,), jnp.int32),
            n, 64, 32, static_trip=False, interpret=True,
        )
        got = _tiles_to_grid(out, n)
        assert (np.asarray(ref) == np.asarray(got)).all(), scale


def test_static_voxelizer_matches_queue():
    """Build-once StaticVoxelizer == the per-call queue path, bit-for-bit,
    across repeated dispatches (incl. the benchmark perturb no-op)."""
    v, t = _cases()["box"]
    v = jnp.asarray(v, jnp.float32)
    t = jnp.asarray(t, jnp.int32)
    n = 64
    want = np.asarray(vq.voxelize_parity_queue(v, t, n, interpret=True))
    sv = vq.StaticVoxelizer(v, t, n, interpret=True)
    np.testing.assert_array_equal(np.asarray(sv()), want)
    np.testing.assert_array_equal(
        np.asarray(sv(perturb=jnp.float32(3.0))), want
    )


def test_static_voxelizer_multigroup(monkeypatch):
    """StaticVoxelizer over the 512^3-style VMEM group split (forced small)."""
    from meshes import icosphere_mesh

    v, _, t = icosphere_mesh(2)
    v = jnp.asarray(v, jnp.float32)
    t = jnp.asarray(t, jnp.int32)
    n = 64
    ref = pack_bits_z(voxelize_parity_ref(v, t, n=n))
    monkeypatch.setattr(vq, "VMEM_OUT_BUDGET", 8 * 1024)
    sv = vq.StaticVoxelizer(v, t, n, interpret=True)
    assert len(sv.groups) > 1
    np.testing.assert_array_equal(np.asarray(sv()), np.asarray(ref))


def test_suffix_parity_reference():
    """The jnp suffix-parity reference matches a brute-force bit loop (the
    in-kernel conversion implements the same recurrence)."""
    rng = np.random.default_rng(3)
    words = jnp.asarray(rng.integers(-2**31, 2**31, size=(4, 2, 8), dtype=np.int64).astype(np.int32))
    got = np.asarray(vq.suffix_parity_words(words)).astype(np.uint32)
    w = np.asarray(words).astype(np.uint32)
    for i in range(4):
        for lane in range(8):
            bits = np.concatenate([(w[i, t, lane] >> np.arange(32)) & 1 for t in range(2)])
            suf = np.cumsum(bits[::-1])[::-1] & 1  # parity of bits >= k
            expect = np.concatenate([suf[:32], suf[32:]])
            got_bits = np.concatenate([(got[i, t, lane] >> np.arange(32)) & 1 for t in range(2)])
            assert (got_bits == expect).all()


def test_deforming_multigroup_matches_static(monkeypatch):
    """512^3-style grouped deforming path, forced at a small grid: the
    per-group assembled queues + launches must reproduce the host-layout
    static queue bit-for-bit, both at rest and deformed."""
    import dxrvoxelizer_tpu.ops.voxelize_queue as vq
    from meshes import icosphere_mesh

    v, _, t = icosphere_mesh(2)
    v = jnp.asarray(v)
    t = jnp.asarray(t)
    n = 64
    monkeypatch.setattr(vq, "VMEM_OUT_BUDGET", 8 * 1024)  # force 4 groups
    dv = vq.DeformingVoxelizer(v, t, n, interpret=True)
    assert dv.n_groups > 1, dv.n_groups
    w_static = np.asarray(vq.voxelize_parity_queue(v, t, n, interpret=True))
    np.testing.assert_array_equal(np.asarray(dv(v, check=True)), w_static)
    v2 = v * 1.07 + jnp.asarray([0.02, -0.03, 0.01])
    w2_static = np.asarray(vq.voxelize_parity_queue(v2, t, n, interpret=True))
    np.testing.assert_array_equal(np.asarray(dv(v2, check=True)), w2_static)
