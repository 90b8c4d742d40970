"""Per-frame accel refit for deforming meshes (ops/raystab_refit.py).

Contract: a refitted accel answers queries on the DEFORMED mesh
bit-exactly vs the radial oracle, as long as every vertex stays within
``pad`` of its rest position — the padded cone bins are a conservative
prefilter (raystab_fast._cone_keys), and the refit regathers the exact
coefficient/normal rows a fresh build would (raystab_refit._refit_tables).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dxrvoxelizer_tpu.ops.raystab_fast import (
    build_raystab_accel2,
    build_raystab_compact2,
    raystab_query2,
)
from dxrvoxelizer_tpu.ops.raystab_refit import RaystabRefitter
from dxrvoxelizer_tpu.ops.voxelize_ref import voxelize_raystab_radial_ref

from meshes import icosphere_mesh, tetrahedron_mesh


def _jx(mesh):
    v, n, t = mesh[:3]
    return jnp.asarray(v), jnp.asarray(n), jnp.asarray(t)


def _wobble(v, nr, amp, phase=0.0):
    """The app's deforming config: displacement along rest normals,
    |amp_i| <= amp (app/main.py -deform)."""
    a = amp * np.sin(2 * np.pi * phase + np.asarray(v)[:, :1] * 5.0)
    return v + jnp.asarray(a.astype(np.float32)) * nr


def test_pad_zero_compact_identical():
    """pad=0.0 must reproduce the static binning bit-for-bit — the
    on-disk accel cache serves pad-less keys from either code path."""
    v, nr, t = _jx(icosphere_mesh(2))
    a = build_raystab_compact2(v, t, n=32)
    b = build_raystab_compact2(v, t, n=32, pad=0.0)
    assert len(a.classes) == len(b.classes)
    for (rt_a, tab_a, bd_a), (rt_b, tab_b, bd_b) in zip(
        a.classes, b.classes
    ):
        assert (rt_a == rt_b).all()
        assert (tab_a == tab_b).all()
        assert (bd_a is None) == (bd_b is None)
        if bd_a is not None:
            assert (bd_a == bd_b).all()
    assert (a.ov_ids is None) == (b.ov_ids is None)


def test_padded_static_query_still_bitexact():
    """A padded accel on the REST mesh is a conservative superset of the
    exact bins — the intersection test rejects extras, so the query is
    unchanged."""
    v, nr, t = _jx(icosphere_mesh(2))
    n = 32
    occ_r, rgba_r = voxelize_raystab_radial_ref(v, nr, t, n=n, ray_chunk=2048)
    accel = build_raystab_accel2(v, t, nr, n=n, pad=0.08)
    occ, rgba = raystab_query2(v, nr, t, accel, interpret=True)
    assert bool((occ == occ_r).all())
    assert bool((rgba == rgba_r).all())


@pytest.mark.parametrize("phase", [0.25, 0.6], ids=["p25", "p60"])
def test_refit_bitexact_vs_radial_oracle_deformed(phase):
    """Refit on a deformed frame == the radial oracle on that frame,
    bit-for-bit (occupancy AND normals)."""
    v, nr, t = _jx(icosphere_mesh(2))
    n = 32
    rf = RaystabRefitter(v, t, nr, n=n, pad=0.06)
    v_t = _wobble(v, nr, amp=0.04, phase=phase)
    accel_t = rf.refit(v_t, nr, check=True)
    occ, rgba = raystab_query2(v_t, nr, t, accel_t, interpret=True)
    occ_r, rgba_r = voxelize_raystab_radial_ref(
        v_t, nr, t, n=n, ray_chunk=2048
    )
    assert bool((occ == occ_r).all())
    assert bool((rgba == rgba_r).all())


@pytest.mark.parametrize("phase", [0.25, 0.6], ids=["p25", "p60"])
def test_directional_refit_bitexact_vs_oracle(phase):
    """pad_dirs=normals (the app's -deform contract: displacement along
    vertex normals only) builds the capsule/6-point-hull padded bins
    (raystab_fast._capsule_params + the corner-extrema rectangles) —
    ~2x smaller candidate tables than the isotropic ball on the dragon,
    and still bit-exact vs the radial oracle on every deformed frame."""
    v, nr, t = _jx(icosphere_mesh(2))
    n = 32
    rf = RaystabRefitter(v, t, nr, n=n, pad=0.06, pad_dirs=nr)
    v_t = _wobble(v, nr, amp=0.055, phase=phase)  # near the pad bound
    accel_t = rf.refit(v_t, nr, check=True)
    occ, rgba = raystab_query2(v_t, nr, t, accel_t, interpret=True)
    occ_r, rgba_r = voxelize_raystab_radial_ref(
        v_t, nr, t, n=n, ray_chunk=2048
    )
    assert bool((occ == occ_r).all())
    assert bool((rgba == rgba_r).all())


def test_directional_refit_check_rejects_off_axis():
    """refit(check=True) must reject displacements off the declared
    pad_dirs axis (the directional bins are not conservative for them)."""
    v, nr, t = _jx(icosphere_mesh(1))
    rf = RaystabRefitter(v, t, nr, n=32, pad=0.06, pad_dirs=nr)
    tangent = np.cross(np.asarray(nr), np.array([0.3, 0.9, 0.1]))
    tangent /= np.maximum(
        np.linalg.norm(tangent, axis=-1, keepdims=True), 1e-9
    )
    v_t = v + 0.03 * jnp.asarray(tangent.astype(np.float32))
    with pytest.raises(RuntimeError, match="off-axis"):
        rf.refit(v_t, check=True)


def test_refit_near_origin_mesh():
    """A mesh whose padded cones reach the origin exercises the overflow
    refit path."""
    v, nr, t = _jx(tetrahedron_mesh())
    n = 32
    rf = RaystabRefitter(v, t, nr, n=n, pad=0.05)
    v_t = _wobble(v, nr, amp=0.03, phase=0.4)
    accel_t = rf.refit(v_t, nr)
    occ, rgba = raystab_query2(v_t, nr, t, accel_t, interpret=True)
    occ_r, rgba_r = voxelize_raystab_radial_ref(
        v_t, nr, t, n=n, ray_chunk=2048
    )
    assert bool((occ == occ_r).all())
    assert bool((rgba == rgba_r).all())


def test_refit_tables_match_fresh_assembly_at_rest():
    """Refitting with the REST geometry reproduces the rest assembly's
    coefficient/normal tables bit-for-bit (pure-gather contract)."""
    v, nr, t = _jx(icosphere_mesh(1))
    rf = RaystabRefitter(v, t, nr, n=32, pad=0.05)
    accel_r = rf.refit(v, nr)
    for cls_0, cls_r in zip(rf.rest_accel.levels[0], accel_r.levels[0]):
        assert (np.asarray(cls_0[1]) == np.asarray(cls_r[1])).all()  # coefs
        assert (np.asarray(cls_0[4]) == np.asarray(cls_r[4])).all()  # ntab
    assert (rf.rest_accel.ov_dense is None) == (accel_r.ov_dense is None)
    if accel_r.ov_dense is not None:
        for i in (1, 2):
            assert (
                np.asarray(rf.rest_accel.ov_dense[i])
                == np.asarray(accel_r.ov_dense[i])
            ).all()


def test_refit_coef_only_matches_full_refit():
    """The unchanged-normals fast path (normals=None, or the same array
    object — the app's -deform) == the full refit with equal-valued
    normals, bit-for-bit on every table."""
    v, nr, t = _jx(icosphere_mesh(2))
    rf = RaystabRefitter(v, t, nr, n=32, pad=0.06)
    v_t = _wobble(v, nr, amp=0.04, phase=0.3)
    a = rf.refit(v_t)  # coef-only (normals omitted)
    nr2 = jnp.array(np.asarray(nr))  # distinct object -> full refit path
    b = rf.refit(v_t, nr2)
    for cls_a, cls_b in zip(a.levels[0], b.levels[0]):
        assert (np.asarray(cls_a[1]) == np.asarray(cls_b[1])).all()  # coefs
        assert (np.asarray(cls_a[4]) == np.asarray(cls_b[4])).all()  # ntab
    assert (a.ov_dense is None) == (b.ov_dense is None)
    if a.ov_dense is not None:
        for i in (1, 2):
            assert (
                np.asarray(a.ov_dense[i]) == np.asarray(b.ov_dense[i])
            ).all()


def test_refit_deformed_normals_full_path():
    """A frame whose NORMALS genuinely change (recomputed per frame) takes
    the full refit path and stays bit-exact vs the oracle on the deformed
    (verts, normals)."""
    v, nr, t = _jx(icosphere_mesh(2))
    n = 32
    rf = RaystabRefitter(v, t, nr, n=n, pad=0.06)
    v_t = _wobble(v, nr, amp=0.04, phase=0.7)
    tilt = 0.2 * np.sin(np.asarray(v)[:, 1:2] * 3.0)
    nr_t = np.asarray(nr) + tilt * np.roll(np.asarray(nr), 1, axis=1)
    nr_t = jnp.asarray(
        (nr_t / np.linalg.norm(nr_t, axis=-1, keepdims=True))
        .astype(np.float32)
    )
    accel_t = rf.refit(v_t, nr_t)
    occ, rgba = raystab_query2(v_t, nr_t, t, accel_t, interpret=True)
    occ_r, rgba_r = voxelize_raystab_radial_ref(
        v_t, nr_t, t, n=n, ray_chunk=2048
    )
    assert bool((occ == occ_r).all())
    assert bool((rgba == rgba_r).all())


def test_refit_pad_check_raises():
    v, nr, t = _jx(icosphere_mesh(1))
    rf = RaystabRefitter(v, t, nr, n=32, pad=0.02)
    v_far = v + jnp.float32(0.05)  # uniform shift > pad
    with pytest.raises(RuntimeError, match="exceeds the refit pad"):
        rf.refit(v_far, nr, check=True)
