"""Multi-chip production voxelization: tile groups across devices.

The work-queue kernel's tile range already splits into contiguous chunk
subranges (ops/voxelize_queue.py groups them to bound VMEM). The multi-chip
form places one group per device: binning is embarrassingly parallel over
column tiles (no triangle exchange — each device gets exactly the queue
slice its tiles need), so the frame's only cross-chip traffic is collecting
the packed occupancy words at the end (over ICI; 2 MB at 256^3). This is the
scale-out path for grids past one chip's latency budget (SURVEY.md section 5
"grid resolution scaling").

Device placement uses explicit ``jax.device_put`` + per-device jit dispatch
(XLA queues all groups asynchronously, so they run concurrently) rather than
``shard_map``: the queue build needs a host sync, which cannot live inside a
traced collective program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dxrvoxelizer_tpu.ops.voxelize_queue import (
    NCOEF,
    TILE_X,
    TILE_Y,
    _queue_run_group,
    _tiles_to_grid,
    build_queue,
)


def voxelize_parity_multichip(
    verts_norm: jnp.ndarray,
    tris: jnp.ndarray,
    n: int,
    devices: list | None = None,
    k_chunk: int = 64,
    interpret: bool = False,
) -> jnp.ndarray:
    """Data-parallel parity voxelization -> packed words [N,N,N//32] on
    ``devices[0]``. Bit-identical to the single-chip queue kernel."""
    devices = list(jax.devices()) if devices is None else list(devices)
    ntx, nty = n // TILE_X, n // TILE_Y
    n_dev = len(devices)
    while ntx % n_dev:  # group boundary = whole tx rows of tiles
        n_dev -= 1
    devices = devices[:n_dev]
    n_tiles = ntx * nty
    tiles_grp = n_tiles // n_dev

    coefs, chunk_tile, chunk_nsub, chunk_last, _ = build_queue(
        verts_norm, tris, n, k_chunk=k_chunk
    )
    ct = np.asarray(chunk_tile)
    cn = np.asarray(chunk_nsub)
    cl = np.asarray(chunk_last)

    outs = []
    for g, dev in enumerate(devices):
        lo, hi = g * tiles_grp, (g + 1) * tiles_grp
        c0, c1 = int(np.searchsorted(ct, lo)), int(np.searchsorted(ct, hi))
        nc = max(-(-(c1 - c0) // 128) * 128, 128)
        tile_g = np.full(nc, tiles_grp - 1, dtype=np.int32)
        nsub_g = np.zeros(nc, dtype=np.int32)
        last_g = np.zeros(nc, dtype=np.int32)
        tile_g[: c1 - c0] = ct[c0:c1] - lo
        nsub_g[: c1 - c0] = cn[c0:c1]
        last_g[: c1 - c0] = cl[c0:c1]
        start, end = c0 * k_chunk, (c0 + nc) * k_chunk
        coef_g = coefs[start : min(end, coefs.shape[0])]
        if end > coefs.shape[0]:
            coef_g = jnp.concatenate(
                [coef_g, jnp.zeros((end - coefs.shape[0], NCOEF), coefs.dtype)]
            )
        # place this group's queue on its device; the jitted group runner
        # dispatches wherever its operands live
        coef_d = jax.device_put(coef_g, dev)
        tile_d = jax.device_put(jnp.asarray(tile_g), dev)
        nsub_d = jax.device_put(jnp.asarray(nsub_g), dev)
        last_d = jax.device_put(jnp.asarray(last_g), dev)
        off_d = jax.device_put(jnp.asarray([lo], jnp.int32), dev)
        outs.append(
            _queue_run_group(
                coef_d, tile_d, nsub_d, last_d, off_d, n, k_chunk,
                tiles_grp, interpret=interpret, static_trip=True,
            )
        )
    # the frame's one cross-chip transfer: gather group outputs
    gathered = [jax.device_put(o, devices[0]) for o in outs]
    out = jnp.concatenate(gathered, axis=0)
    return _tiles_to_grid(out, n)
