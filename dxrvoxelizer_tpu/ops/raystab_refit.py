"""Per-frame ray-stab accel REFIT for deforming meshes — the DXR
acceleration-structure UPDATE analog.

The reference builds its BLAS/TLAS once for static geometry
(/root/reference/DXRVoxelizer/Content/Voxelizer.cpp:264-326); DXR's
general machinery also offers PERFORM_UPDATE refits for deforming,
fixed-topology meshes. The TPU-native equivalent splits the gen-2 accel
(ops/raystab_fast.py) into:

- a GEOMETRY-SHAPE half — per-class candidate id tables, ray strips,
  slot scatter streams, chunk-skip bounds, sort keys — built ONCE from
  the rest mesh with a deformation ``pad`` (see
  raystab_fast._cone_keys): the padded cone bins stay a conservative
  prefilter for any per-vertex displacement <= pad, so these tables are
  valid for EVERY frame; and
- a GEOMETRY-VALUE half — the radial coefficient and vertex-normal rows
  the kernels actually fold over — regathered on device each frame from
  the deformed vertices (one [T+1, 12] coefficient matrix + one XLA row
  gather per capacity class; static shapes, one compile per topology).

A refitted accel is bit-identical to a fresh
``build_raystab_accel2(deformed_verts, ...)`` in every kernel-visible
value except the candidate sets, which are a conservative superset —
the exact intersection test rejects the extras, so queries stay
bit-exact vs the radial oracle on the deformed mesh (pinned by
tests/test_raystab_refit.py).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from dxrvoxelizer_tpu.ops.raystab_fast import (
    LANE_MIN_K,
    RaystabAccel2,
    _radial_coef_matrix,
    assemble_raystab_accel2,
    build_raystab_compact2,
    table_k,
)


@jax.jit
def _normal_rows(normals, tris):
    """Per-triangle normal rows [T+1, 12]: n0(3) n1(3) n2(3) pad(3), last
    row all-zero — bit-identical to the host assembly in
    raystab_fast.assemble_raystab_accel2 (pure row gathers)."""
    t_count = tris.shape[0]
    rows = jnp.concatenate(
        [
            normals[tris[:, 0]].astype(jnp.float32),
            normals[tris[:, 1]].astype(jnp.float32),
            normals[tris[:, 2]].astype(jnp.float32),
            jnp.zeros((t_count, 3), jnp.float32),
        ],
        axis=-1,
    )
    return jnp.concatenate([rows, jnp.zeros((1, 12), jnp.float32)])


@partial(jax.jit, static_argnames=("lanes", "ov_lane"))
def _refit_tables(verts_norm, normals, tris, tabs, ov_ids,
                  lanes: tuple, ov_lane: bool):
    """Deformed geometry -> fresh (coefs, ntab) per class + overflow.

    ``tabs``: per-class candidate id tables [VC, K] int32 / -1 (device
    resident, static across frames). Gathers/transposes are identical to
    raystab_fast._assemble_class_dev, so refitted tables match a fresh
    assembly bit-for-bit."""
    t_count = tris.shape[0]
    coef = _radial_coef_matrix(
        verts_norm, tris, jnp.arange(t_count, dtype=jnp.int32)
    )
    ncoef = _normal_rows(normals, tris)
    outs = []
    for tab, lane_aligned in zip(tabs, lanes):
        ti = jnp.where(tab >= 0, tab, t_count)
        cf = coef[ti]
        nf = ncoef[ti]
        if lane_aligned:
            cf = cf.transpose(0, 2, 1)
            nf = nf.transpose(0, 2, 1)
        outs.append((cf, nf))
    ov = None
    if ov_ids is not None:
        ti = jnp.where(ov_ids >= 0, ov_ids, t_count)
        cf = coef[ti]
        nf = ncoef[ti]
        if ov_lane:
            cf = cf.T
            nf = nf.T
        ov = (cf, nf)
    return tuple(outs), ov


class RaystabRefitter:
    """Build once from the rest mesh, refit per frame.

    ``pad``: per-vertex displacement bound (normalized space) every
    frame's vertices must respect relative to the REST vertices; the
    padded bins are conservative within it (raystab_fast._cone_keys).
    Exceeding it can silently drop hits — ``refit(..., check=True)``
    verifies the bound with one host sync.

    ``refit`` costs one coefficient-matrix build + one row gather per
    capacity class on device (static shapes, compiled once); the ray
    strips, scatter streams, chunk bounds and sort keys are reused from
    the rest build. Use exactly like a static accel:

        rf = RaystabRefitter(rest_verts, tris, rest_normals, n=64, pad=0.05)
        accel_t = rf.refit(verts_t, normals_t)   # per frame
        occ, rgba = raystab_query2(verts_t, normals_t, tris, accel_t)
    """

    def __init__(self, verts_rest, tris, normals_rest, n: int = 64,
                 pad: float = 0.05, gs: tuple | None = None, span: int = 8,
                 use_cache: bool = False, cache_dir: str | None = None):
        assert pad > 0.0, "a zero-pad refitter cannot absorb deformation"
        self.n = int(n)
        self.pad = float(pad)
        self.tris = jnp.asarray(tris)
        if use_cache:
            from dxrvoxelizer_tpu.utils.accel_cache import cached_compact2

            compact = cached_compact2(
                verts_rest, tris, n, gs, span, pad=self.pad,
                cache_dir=cache_dir,
            )
        else:
            compact = build_raystab_compact2(
                verts_rest, tris, n, gs, span, pad=self.pad
            )
        accel0 = assemble_raystab_accel2(
            compact, verts_rest, tris, normals_rest
        )
        self.stats = accel0.stats
        self.sort_keys = accel0.sort_keys
        self._verts_rest = jnp.asarray(verts_rest)
        # static per-class halves from the rest assembly: rays, scatter,
        # bounds (positions 0, 2, 3 of each class 5-tuple)
        self._static_cls = tuple(
            (cls[0], cls[2], cls[3]) for cls in accel0.levels[0]
        )
        self._lanes = tuple(
            bool(table_k(cls[1]) >= LANE_MIN_K) for cls in accel0.levels[0]
        )
        # device-resident candidate id tables (the compact half's classes
        # line up 1:1 with the assembled classes)
        self._tabs = tuple(
            jnp.asarray(tab) for (_rt, tab, _b) in compact.classes
        )
        self._ov_ids = (
            jnp.asarray(compact.ov_ids) if compact.ov_ids is not None
            else None
        )
        self._ov_rays = accel0.ov_dense[0] if accel0.ov_dense else None
        self._ov_lane = (
            bool(table_k(accel0.ov_dense[1]) >= LANE_MIN_K)
            if accel0.ov_dense else False
        )
        self.rest_accel = accel0

    def device_state(self) -> tuple:
        """The device-buffer pytree :meth:`refit_with_state` consumes.

        Callers that trace a refit inside their own jit (e.g. a scan-
        timed frame loop) must pass this through the jit's ARGUMENTS —
        reaching for ``self``'s buffers from inside the traced function
        embeds them in the HLO as constants."""
        return (self.tris, self._tabs, self._ov_ids, self._static_cls,
                self._ov_rays, self.sort_keys)

    def refit_with_state(self, state, verts_norm, normals) -> RaystabAccel2:
        """Traceable core of :meth:`refit`: ``state`` is
        :meth:`device_state` (or its traced passthrough)."""
        tris, tabs, ov_ids, static_cls, ov_rays, sort_keys = state
        outs, ov = _refit_tables(
            verts_norm, normals, tris,
            tabs, ov_ids, self._lanes, self._ov_lane,
        )
        classes = tuple(
            (rays, cf, sc, bounds, nf)
            for (rays, sc, bounds), (cf, nf) in zip(static_cls, outs)
        )
        ov_dense = (ov_rays, ov[0], ov[1]) if ov is not None else None
        return RaystabAccel2(
            n=self.n,
            levels=(classes,),
            ov_dense=ov_dense,
            stats=self.stats,
            sort_keys=sort_keys,
        )

    def refit(self, verts_norm, normals, check: bool = False) -> RaystabAccel2:
        """Deformed (verts, normals) -> a query-ready accel (async).

        ``check=True`` host-syncs to verify the displacement bound."""
        if check:
            disp = float(jnp.max(jnp.linalg.norm(
                jnp.asarray(verts_norm) - self._verts_rest, axis=-1
            )))
            if disp > self.pad:
                raise RuntimeError(
                    f"deformation {disp:.4f} exceeds the refit pad "
                    f"{self.pad:.4f}; rebuild the refitter with more"
                )
        return self.refit_with_state(
            self.device_state(), jnp.asarray(verts_norm),
            jnp.asarray(normals),
        )
