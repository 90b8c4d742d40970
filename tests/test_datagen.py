"""Batch datagen tests (throughput config)."""

import numpy as np

from dxrvoxelizer_tpu.parallel.datagen import voxelize_batch, voxelize_mesh_file


def _write_tet(tmp_path, name="t.obj", scale=1.0):
    p = tmp_path / name
    p.write_text(
        f"""
v {0.61*scale} {0.53*scale} {0.47*scale}
v {-0.67*scale} {0.41*scale} {-0.29*scale}
v {0.13*scale} {-0.59*scale} {-0.63*scale}
v {-0.11*scale} {-0.37*scale} {0.71*scale}
f 1 2 3
f 1 4 2
f 1 3 4
f 2 4 3
"""
    )
    return p


def test_single_mesh_file(tmp_path):
    p = _write_tet(tmp_path)
    r = voxelize_mesh_file(p, n=32, impl="xla", out_dir=tmp_path / "out")
    assert r.occupied > 0
    words = np.load(r.out_file)
    assert words.shape == (32, 32, 32 // 32)


def test_batch_multiple_sizes(tmp_path):
    paths = [
        _write_tet(tmp_path, "a.obj", 1.0),
        _write_tet(tmp_path, "b.obj", 0.5),
    ]
    results = voxelize_batch(paths, n=32, impl="xla")
    assert len(results) == 2
    # bound-normalization makes a uniformly scaled copy voxelize identically
    assert results[1].occupied == results[0].occupied
    assert all(r.occupied > 0 for r in results)


def test_batch_round_robins_devices(tmp_path):
    """Meshes spread over the 8-device CPU mesh, one per device in order,
    with identical results regardless of placement."""
    import jax

    devices = jax.local_devices()
    assert len(devices) >= 2, "conftest should provide 8 virtual devices"
    paths = [
        _write_tet(tmp_path, f"m{i}.obj", 1.0 + 0.1 * i) for i in range(5)
    ]
    results = voxelize_batch(
        paths, n=32, impl="xla", out_dir=tmp_path / "out", devices=devices
    )
    placed = [r.device for r in results]
    # round-robin: mesh i on device i % D
    assert placed == [str(devices[i % len(devices)]) for i in range(5)]
    assert len(set(placed)) == 5  # >1 device actually received work
    # placement must not change the result: all scaled tets voxelize equal
    assert len({r.occupied for r in results}) == 1
    grids = [np.load(r.out_file) for r in results]
    for g in grids[1:]:
        np.testing.assert_array_equal(g, grids[0])


def test_shard_paths_strided():
    from dxrvoxelizer_tpu.parallel.datagen import shard_paths

    paths = [f"m{i}" for i in range(7)]
    shards = [shard_paths(paths, pi, 3) for pi in range(3)]
    assert shards[0] == ["m0", "m3", "m6"]
    assert shards[1] == ["m1", "m4"]
    assert shards[2] == ["m2", "m5"]
    # every path exactly once across processes
    assert sorted(sum(shards, [])) == sorted(paths)
    # single-process default is a no-op
    assert shard_paths(paths) == paths
