"""On-disk accel cache (utils/accel_cache.py): save/load roundtrip must be
bit-transparent — a loaded accel answers queries identically to the built
one, including optional parts (chunk-skip bounds, near-origin overflow)."""

import numpy as np
import jax.numpy as jnp

from dxrvoxelizer_tpu.ops.raystab_fast import (
    build_raystab_accel2,
    raystab_query2,
)
from dxrvoxelizer_tpu.utils.accel_cache import (
    cached_build_raystab_accel2,
    load_accel2,
    save_accel2,
)
from tests.meshes import icosphere_mesh


def _near_origin_soup(nt=300, seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((nt, 1, 3)).astype(np.float32) * 0.02
    offsets = rng.standard_normal((nt, 3, 3)).astype(np.float32) * 0.3
    tri_v = centers + offsets
    verts = jnp.asarray(tri_v.reshape(-1, 3))
    tris = jnp.arange(nt * 3, dtype=jnp.int32).reshape(nt, 3)
    e1 = tri_v[:, 1] - tri_v[:, 0]
    e2 = tri_v[:, 2] - tri_v[:, 0]
    fn = np.cross(e1, e2)
    fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-20)
    normals = jnp.asarray(np.repeat(fn, 3, axis=0).astype(np.float32))
    return verts, normals, tris


def test_save_load_roundtrip_query_bitexact(tmp_path):
    v_np, n_np, t_np = icosphere_mesh(2, radius=0.4, center=(0.3, 0.1, -0.2))
    v, nr, t = jnp.asarray(v_np), jnp.asarray(n_np), jnp.asarray(t_np)
    accel = build_raystab_accel2(v, t, nr, n=16)
    path = str(tmp_path / "a.npz")
    save_accel2(path, accel)
    loaded = load_accel2(path)
    assert loaded is not None
    assert loaded.n == accel.n
    assert loaded.stats == accel.stats
    occ_b, rgba_b = raystab_query2(v, nr, t, accel, interpret=True)
    occ_l, rgba_l = raystab_query2(v, nr, t, loaded, interpret=True)
    assert bool((np.asarray(occ_l) == np.asarray(occ_b)).all())
    assert bool((np.asarray(rgba_l) == np.asarray(rgba_b)).all())


def test_roundtrip_with_overflow_list(tmp_path):
    """Near-origin soup: ov_dense present; roundtrip stays bit-exact."""
    v, nr, t = _near_origin_soup()
    accel = build_raystab_accel2(v, t, nr, n=16)
    assert accel.ov_dense is not None
    path = str(tmp_path / "ov.npz")
    save_accel2(path, accel)
    loaded = load_accel2(path)
    occ_b, rgba_b = raystab_query2(v, nr, t, accel, interpret=True)
    occ_l, rgba_l = raystab_query2(v, nr, t, loaded, interpret=True)
    assert bool((np.asarray(occ_l) == np.asarray(occ_b)).all())
    assert bool((np.asarray(rgba_l) == np.asarray(rgba_b)).all())


def test_cached_build_hits_and_keys(tmp_path):
    v_np, n_np, t_np = icosphere_mesh(1)
    v, nr, t = jnp.asarray(v_np), jnp.asarray(n_np), jnp.asarray(t_np)
    d = str(tmp_path / "cache")
    a1 = cached_build_raystab_accel2(v, t, nr, n=16, cache_dir=d)
    import os

    files = os.listdir(d)
    assert len(files) == 1
    a2 = cached_build_raystab_accel2(v, t, nr, n=16, cache_dir=d)
    assert a2.stats == a1.stats
    occ1, _ = raystab_query2(v, nr, t, a1, interpret=True)
    occ2, _ = raystab_query2(v, nr, t, a2, interpret=True)
    assert bool((np.asarray(occ1) == np.asarray(occ2)).all())
    # a different grid size keys a different entry
    cached_build_raystab_accel2(v, t, nr, n=32, cache_dir=d)
    assert len(os.listdir(d)) == 2


def test_load_missing_or_corrupt_returns_none(tmp_path):
    assert load_accel2(str(tmp_path / "nope.npz")) is None
    bad = tmp_path / "bad.npz"
    bad.write_bytes(b"not an npz")
    assert load_accel2(str(bad)) is None
