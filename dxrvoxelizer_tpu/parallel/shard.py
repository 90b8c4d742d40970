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

import jax
import jax.numpy as jnp
import numpy as np
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


def sharded_frame_fast(
    mesh: Mesh,
    n: int,
    width: int,
    height: int,
    tris_count: int,
    sample_consts,
    num_chunks_cap: int = 512,
    k_chunk: int = 64,
    interpret: bool = False,
):
    """Production multi-chip frame: Pallas kernels under ``shard_map``.

    - voxelize: each device runs the device-layout queue build restricted to
      its TILE GROUP plus the work-queue kernel (ops/voxelize_queue.py) —
      binning is embarrassingly parallel, so triangles are replicated and no
      collective runs until...
    - grid exchange: ONE ``all_gather`` of the per-group packed words over
      ICI (2 MB at 256^3);
    - render: each device shear-warps its horizontal screen band from the
      gathered grid (compositing over the small intermediate is replicated;
      the per-pixel resolve is band-local).

    The shear-warp orientation statics come from ``sample_consts`` (a
    FrameConstants); a camera crossing a major-axis boundary needs a
    rebuild, exactly like the single-chip host wrapper re-derives them per
    frame. ``interpret`` runs the Pallas kernels in interpret mode (the
    CPU-mesh dry-run configuration).
    """
    from dxrvoxelizer_tpu.ops.packing import unpack_bits_z
    from dxrvoxelizer_tpu.ops import raymarch_warp as rw
    from dxrvoxelizer_tpu.ops.voxelize_queue import (
        TILE_X,
        TILE_Y,
        _build_queue_device,
        _queue_run_group,
        _tiles_to_grid,
    )

    (axis,) = mesh.axis_names
    n_dev = mesh.devices.size
    ntx, nty = n // TILE_X, n // TILE_Y
    n_tiles = ntx * nty
    assert n_tiles % n_dev == 0, f"{n_tiles} tiles not divisible by {n_dev}"
    assert height % n_dev == 0, f"height {height} not divisible by {n_dev}"
    tpd = n_tiles // n_dev
    band = height // n_dev

    s2l_np = np.asarray(sample_consts.screen_to_local)
    eye_np = np.asarray(sample_consts.local_space_eye_pt)
    light_np = np.asarray(sample_consts.local_space_light_pt)
    waxis, wflip, wswap = rw._tex_params(eye_np, s2l_np, width, height)
    box_px = rw._box_screen_px(s2l_np, width, height)
    m = int(np.clip(16 * round(0.9 * box_px / 16), 32, 128))
    span = 32 * 1.2 * m / box_px + 9.0
    res_win = 16 if span <= 16.0 else (32 if span <= 32.0 else min(48, m))
    from dxrvoxelizer_tpu.ops.raymarch_ref import TEX_SCALE

    ld = np.asarray(TEX_SCALE) * (light_np / np.linalg.norm(light_np))
    l_axis = int(np.argmax(np.abs(ld)))
    l_flip = bool(ld[l_axis] < 0)

    def frame(verts_norm, tris, s2l, eye, light, clear):
        d = jax.lax.axis_index(axis)
        lo = d * tpd

        coefs, tile_of, nsub, last, _ok = _build_queue_device(
            verts_norm, tris, n, num_chunks_cap, k_chunk, 4, 8,
            tile_lo=lo, tile_hi=lo + tpd,
        )
        group = _queue_run_group(
            coefs, tile_of, nsub, last, lo.reshape(1), n, k_chunk, tpd,
            static_trip=False, interpret=interpret,
        )
        # the frame's one collective: assemble all tile groups over ICI
        tiles_all = jax.lax.all_gather(group, axis, axis=0, tiled=True)
        words = _tiles_to_grid(tiles_all, n)
        density = unpack_bits_z(words, n).astype(jnp.float32)

        lv = rw.light_sweep(density, light, n, l_axis, l_flip)
        img_band = rw._shearwarp_core(
            density, lv, s2l, eye, clear, n, m, width, band,
            waxis, wflip, wswap, not interpret, res_win=res_win,
            y_off=(d * band).astype(jnp.float32).reshape(()),
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
        args = jax.tree.map(
            lambda x: jax.lax.with_sharding_constraint(x, rep),
            (verts_norm, tris, s2l, eye, light, clear),
        )
        return shmapped(*args)

    return run
