"""Multi-chip frame step via shard_map (the scale-out path).

Design (SURVEY.md section 5 "distributed communication backend"):

- **voxelize**: data-parallel over voxel columns — each device computes the
  occupancy of its grid-x slab (triangles replicated; the parity test is
  embarrassingly parallel over columns);
- **grid exchange**: one ``all_gather`` of the slab occupancies over ICI —
  the only collective in the frame;
- **ray-march**: data-parallel over screen rows — each device renders a
  horizontal band of the image from the gathered grid.

Everything happens inside a single ``shard_map``-ped, jitted frame function,
so XLA overlaps the collective with compute where possible.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from dxrvoxelizer_tpu.ops.raymarch_fast import (
    precompute_light_volume,
    raymarch_fast,
)
from dxrvoxelizer_tpu.ops.voxelize_ref import voxelize_parity_ref


def sharded_frame(
    mesh: Mesh,
    n: int,
    width: int,
    height: int,
    n_samples: int = 64,
    n_light: int = 16,
):
    """Build the jitted multi-chip frame step.

    Returns ``frame(verts_norm, tris, s2l, eye, light, clear) -> image``
    with the image sharded row-wise over the mesh axis. Grid-x and screen
    rows must divide the axis size.
    """
    (axis,) = mesh.axis_names
    n_dev = mesh.devices.size
    assert n % n_dev == 0, f"grid {n} not divisible by {n_dev} devices"
    assert height % n_dev == 0, f"height {height} not divisible by {n_dev}"
    slab = n // n_dev
    band = height // n_dev

    def frame(verts_norm, tris, s2l, eye, light, clear):
        d = jax.lax.axis_index(axis)

        # pass 1: my x-slab of the occupancy grid (replicated triangles)
        occ_local = voxelize_parity_ref(
            verts_norm, tris, n=n, x_slab=slab, x_offset=d * slab
        )

        # the frame's one collective: assemble the full grid over ICI
        occ_full = jax.lax.all_gather(occ_local, axis, axis=0, tiled=True)
        density = occ_full.astype(jnp.float32)

        # pass 2: light field (cheap, replicated) + my screen band
        lv = precompute_light_volume(density, light, n_light=n_light)
        img_band = raymarch_fast(
            density, lv, s2l, eye, clear, width, band,
            n_samples=n_samples,
            y_offset=(d * band).astype(jnp.float32),
        )
        return img_band

    shmapped = jax.shard_map(
        frame,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(), P()),
        out_specs=P(axis, None, None),
        check_vma=False,
    )

    rep = NamedSharding(mesh, P())

    @jax.jit
    def run(verts_norm, tris, s2l, eye, light, clear):
        args = jax.tree.map(lambda x: jax.lax.with_sharding_constraint(x, rep),
                            (verts_norm, tris, s2l, eye, light, clear))
        return shmapped(*args)

    return run
