"""Batch voxelization data generation (the Thingi10K throughput config).

BASELINE.json configs include "voxelize 1k-mesh Thingi10K subset at 128^3,
throughput mode". Meshes differ in triangle count, so batching pads triangle
soups to bucketed capacities and runs the jittable brute-force parity kernel
(stable shapes -> one compile per bucket). Multi-chip: meshes round-robin
over devices (embarrassingly parallel, SURVEY.md section 5 "DCN only for
multi-host batch datagen").
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from dxrvoxelizer_tpu.ops.packing import pack_bits_z, unpack_bits_z
from dxrvoxelizer_tpu.ops.voxelize_pallas import voxelize_parity_bruteforce
from dxrvoxelizer_tpu.ops.voxelize_ref import voxelize_parity_ref
from dxrvoxelizer_tpu.utils.objloader import load_obj


@dataclass
class DatagenResult:
    path: str
    n: int
    occupied: int
    out_file: str | None


def _bucket(t: int, k_chunk: int = 512) -> int:
    cap = k_chunk
    while cap < t:
        cap *= 2
    return cap


def voxelize_mesh_file(
    path: str | Path,
    n: int = 128,
    impl: str = "auto",
    out_dir: str | Path | None = None,
) -> DatagenResult:
    """Load one OBJ, solid-voxelize at n^3, optionally save packed .npy."""
    mesh = load_obj(path)
    bound = mesh.bound()
    verts = jnp.asarray(
        (mesh.positions - bound[:3]) / max(float(bound[3]), 1e-20)
    )
    tris = jnp.asarray(mesh.triangles)
    if impl == "auto":
        impl = "queue" if jax.default_backend() != "cpu" else "xla"
    if impl == "queue":
        # the work-queue kernel; its chunk-count bucketing bounds recompiles
        # across the heterogeneous mesh set on its own
        from dxrvoxelizer_tpu.ops.voxelize_queue import voxelize_parity_queue

        words = voxelize_parity_queue(verts, tris, n)
    elif impl == "pallas":
        t = tris.shape[0]
        cap = _bucket(t)
        pad = cap - t
        tris_p = jnp.pad(tris, ((0, pad), (0, 0)))  # degenerate -> valid=0
        words = voxelize_parity_bruteforce(verts, tris_p, n=n)
    else:
        occ = voxelize_parity_ref(verts, tris, n=n)
        words = pack_bits_z(occ)
    occupied = int(unpack_bits_z(words, n).sum())
    out_file = None
    if out_dir is not None:
        out_dir = Path(out_dir)
        out_dir.mkdir(parents=True, exist_ok=True)
        out_file = str(out_dir / (Path(path).stem + f"_{n}.npy"))
        np.save(out_file, np.asarray(words))
    return DatagenResult(str(path), n, occupied, out_file)


def voxelize_batch(
    paths: list[str | Path],
    n: int = 128,
    impl: str = "auto",
    out_dir: str | Path | None = None,
) -> list[DatagenResult]:
    """Throughput mode over a mesh list.

    Capacity bucketing keeps recompiles to O(log max_tris); XLA's async
    dispatch pipelines host-side loading of mesh i+1 with device compute of
    mesh i.
    """
    return [voxelize_mesh_file(p, n=n, impl=impl, out_dir=out_dir) for p in paths]


def main(argv=None) -> int:
    """CLI: ``python -m dxrvoxelizer_tpu.parallel.datagen mesh1.obj ...``

    The Thingi10K throughput config (BASELINE.json): voxelize a mesh list at
    128^3 and write packed ``.npy`` grids.
    """
    import argparse

    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("meshes", nargs="+", help="OBJ files to voxelize")
    ap.add_argument("-grid", type=int, default=128)
    ap.add_argument("-out", default="datagen_out")
    ap.add_argument("-impl", default="auto",
                    choices=["auto", "queue", "pallas", "xla"])
    args = ap.parse_args(argv)
    import time as _time

    t0 = _time.perf_counter()
    results = voxelize_batch(
        args.meshes, n=args.grid, impl=args.impl, out_dir=args.out
    )
    dt = _time.perf_counter() - t0
    for r in results:
        print(f"{r.path}: {r.occupied} occupied -> {r.out_file}")
    print(f"{len(results)} meshes at {args.grid}^3 in {dt:.2f}s "
          f"({len(results)/max(dt,1e-9):.2f} mesh/s)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
