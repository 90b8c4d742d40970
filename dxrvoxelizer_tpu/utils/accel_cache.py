"""On-disk cache of built ray-stab acceleration structures.

The reference builds its BLAS/TLAS once per geometry at init and ships
precompiled shader blobs next to the app (Voxelizer.cpp:264-326; the dxc
offline-compile rule in DXRVoxelizer.vcxproj:169-189) — init cost is paid
once, offline where possible. The TPU analog: the gen-2/4 accel
(ops/raystab_fast.build_raystab_accel2) is a pure function of
(geometry bytes, grid size, cubemap ladder, span, backend), and building
it costs ~34 s of host binning/packing at 256^3 plus remote-compile and
transfer overhead on tunneled devices. So cache the finished tables on
disk keyed by that tuple's hash and rebuild only on miss. Arrays are
stored pre-upload (host numpy): a load still pays the HBM upload, never
the binning/packing/coefficient math.

The key includes ``jax.default_backend()`` because the kernel-facing
coefficient VALUES are computed on the device (bit-exactness vs the
same-backend oracle); an accel built on TPU must not satisfy a CPU run.
"""

from __future__ import annotations

import json
import os
import zipfile

import jax
import jax.numpy as jnp
import numpy as np

_FORMAT = 3  # bump when RaystabAccel2's layout changes
# (2: gen-5 lane-aligned tables; 3: lane-aligned only for K >= LANE_MIN_K)


def default_cache_dir() -> str:
    return os.environ.get(
        "DXRVOX_ACCEL_CACHE",
        os.path.join(
            os.path.expanduser("~"), ".cache", "dxrvoxelizer_tpu", "accel"
        ),
    )


def _accel_key(verts_h, tris_h, normals_h, n: int, gs, span: int) -> str:
    import hashlib

    h = hashlib.sha256()
    h.update(
        f"fmt{_FORMAT}|n{n}|gs{gs}|span{span}|{jax.default_backend()}"
        .encode()
    )
    for a in (verts_h, tris_h, normals_h):
        arr = np.ascontiguousarray(a)
        h.update(str(arr.dtype).encode())
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    return h.hexdigest()[:24]


def save_accel2(path: str, accel) -> None:
    """Serialize a RaystabAccel2 to ``path`` (.npz, atomic rename)."""
    arrays: dict[str, np.ndarray] = {}
    manifest = {
        "format": _FORMAT,
        "n": accel.n,
        "stats_levels": [list(x) for x in accel.stats.levels],
        "near_origin": accel.stats.near_origin,
        "levels": [],
        "ov": accel.ov_dense is not None,
        "sort_keys": [sk is not None for sk in accel.sort_keys],
    }
    for i, level in enumerate(accel.levels):
        classes = []
        for j, (rays, coefs, scatter, bounds, ntab) in enumerate(level):
            pre = f"L{i}C{j}_"
            arrays[pre + "rays"] = np.asarray(rays)
            arrays[pre + "coefs"] = np.asarray(coefs)
            arrays[pre + "scatter"] = np.asarray(scatter)
            if bounds is not None:
                arrays[pre + "bounds"] = np.asarray(bounds)
            arrays[pre + "ntab"] = np.asarray(ntab)
            classes.append({"bounds": bounds is not None})
        manifest["levels"].append(classes)
    if accel.ov_dense is not None:
        for name, a in zip(("rays", "coefs", "ntab"), accel.ov_dense):
            arrays["OV_" + name] = np.asarray(a)
    for i, sk in enumerate(accel.sort_keys):
        if sk is not None:
            arrays[f"SK{i}"] = np.asarray(sk)
    arrays["manifest"] = np.frombuffer(
        json.dumps(manifest).encode(), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, path)


def load_accel2(path: str):
    """Load a RaystabAccel2 saved by :func:`save_accel2` (device upload
    included), or None when the file is absent/unreadable/stale-format."""
    from dxrvoxelizer_tpu.ops.raystab_fast import Raystab2Stats, RaystabAccel2

    try:
        z = np.load(path)
        manifest = json.loads(bytes(z["manifest"]).decode())
        if manifest.get("format") != _FORMAT:
            return None
        levels = []
        for i, classes in enumerate(manifest["levels"]):
            level = []
            for j, meta in enumerate(classes):
                pre = f"L{i}C{j}_"
                level.append((
                    jnp.asarray(z[pre + "rays"]),
                    jnp.asarray(z[pre + "coefs"]),
                    jnp.asarray(z[pre + "scatter"]),
                    jnp.asarray(z[pre + "bounds"]) if meta["bounds"]
                    else None,
                    jnp.asarray(z[pre + "ntab"]),
                ))
            levels.append(tuple(level))
        ov_dense = None
        if manifest["ov"]:
            ov_dense = tuple(
                jnp.asarray(z["OV_" + name])
                for name in ("rays", "coefs", "ntab")
            )
        sort_keys = tuple(
            jnp.asarray(z[f"SK{i}"]) if present else None
            for i, present in enumerate(manifest["sort_keys"])
        )
        return RaystabAccel2(
            n=manifest["n"],
            levels=tuple(levels),
            ov_dense=ov_dense,
            stats=Raystab2Stats(
                levels=tuple(tuple(x) for x in manifest["stats_levels"]),
                near_origin=manifest["near_origin"],
            ),
            sort_keys=sort_keys,
        )
    except (OSError, KeyError, ValueError, json.JSONDecodeError,
            zipfile.BadZipFile):
        return None


def cached_build_raystab_accel2(
    verts_norm, tris, normals, n: int = 64, gs=None, span: int = 8,
    cache_dir: str | None = None,
):
    """build_raystab_accel2 behind the on-disk cache.

    Key: sha256 of (geometry bytes, n, gs, span, backend, format). Miss ->
    build + persist; hit -> load (skips every build stage except the HBM
    upload). Opt out per call with ``cache_dir=False``-y via the plain
    builder, or globally with DXRVOX_ACCEL_CACHE=0.
    """
    from dxrvoxelizer_tpu.ops.raystab_fast import build_raystab_accel2

    root = cache_dir or default_cache_dir()
    if str(root) in ("0", "off", "none"):
        return build_raystab_accel2(verts_norm, tris, normals, n, gs, span)
    verts_h, tris_h, normals_h = jax.device_get((verts_norm, tris, normals))
    key = _accel_key(verts_h, tris_h, normals_h, n, gs, span)
    path = os.path.join(root, key + ".npz")
    accel = load_accel2(path)
    if accel is not None:
        return accel
    accel = build_raystab_accel2(verts_norm, tris, normals, n, gs, span)
    try:
        save_accel2(path, accel)
    except OSError:
        pass  # read-only cache dir: serve the built accel anyway
    return accel
