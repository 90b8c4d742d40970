"""Analytic test meshes (normalized-space coordinates, CCW outward winding)."""

import numpy as np


def box_mesh(lo, hi):
    """Axis-aligned box as 12 triangles with per-face duplicated vertices
    (face normals interpolate exactly). Outward CCW winding (right-handed)."""
    lo = np.asarray(lo, dtype=np.float32)
    hi = np.asarray(hi, dtype=np.float32)
    x0, y0, z0 = lo
    x1, y1, z1 = hi
    # each face: 4 corners CCW seen from outside, normal
    faces = [
        # -x
        ([(x0, y0, z0), (x0, y0, z1), (x0, y1, z1), (x0, y1, z0)], (-1, 0, 0)),
        # +x
        ([(x1, y0, z0), (x1, y1, z0), (x1, y1, z1), (x1, y0, z1)], (1, 0, 0)),
        # -y
        ([(x0, y0, z0), (x1, y0, z0), (x1, y0, z1), (x0, y0, z1)], (0, -1, 0)),
        # +y
        ([(x0, y1, z0), (x0, y1, z1), (x1, y1, z1), (x1, y1, z0)], (0, 1, 0)),
        # -z
        ([(x0, y0, z0), (x0, y1, z0), (x1, y1, z0), (x1, y0, z0)], (0, 0, -1)),
        # +z
        ([(x0, y0, z1), (x1, y0, z1), (x1, y1, z1), (x0, y1, z1)], (0, 0, 1)),
    ]
    verts = []
    norms = []
    tris = []
    for corners, n in faces:
        base = len(verts)
        verts.extend(corners)
        norms.extend([n] * 4)
        tris.append((base, base + 1, base + 2))
        tris.append((base, base + 2, base + 3))
    return (
        np.array(verts, dtype=np.float32),
        np.array(norms, dtype=np.float32),
        np.array(tris, dtype=np.int32),
    )


def tetrahedron_mesh(scale=0.8):
    """Irregular tetrahedron containing the origin; outward winding.

    Vertices chosen asymmetric and off-grid so no voxel-column lies exactly
    on an edge at the grid sizes used in tests.
    """
    v = np.array(
        [
            (0.61, 0.53, 0.47),
            (-0.67, 0.41, -0.29),
            (0.13, -0.59, -0.63),
            (-0.11, -0.37, 0.71),
        ],
        dtype=np.float32,
    ) * np.float32(scale)
    tris = np.array(
        [(0, 1, 2), (0, 3, 1), (0, 2, 3), (1, 3, 2)], dtype=np.int32
    )
    # fix winding outward: flip any face whose normal points toward centroid
    cen = v.mean(axis=0)
    for t in range(len(tris)):
        a, b, c = v[tris[t]]
        n = np.cross(b - a, c - a)
        if np.dot(n, a - cen) < 0:
            tris[t] = tris[t][[0, 2, 1]]
    # smooth vertex normals (radial-ish from centroid)
    norms = v - cen
    norms = norms / np.linalg.norm(norms, axis=1, keepdims=True)
    return v, norms.astype(np.float32), tris


def point_in_mesh_bruteforce(points, verts, tris, axis=2):
    """Independent float64 even-odd test, counting crossings above each point."""
    p = np.asarray(points, dtype=np.float64)
    v = np.asarray(verts, dtype=np.float64)
    inside = np.zeros(len(p), dtype=np.int64)
    a_ax, b_ax = [i for i in range(3) if i != axis]
    for t in tris:
        A, B, C = v[t]
        # 2D barycentric in the projection plane
        d = np.stack([p[:, a_ax] - A[a_ax], p[:, b_ax] - A[b_ax]], axis=1)
        m = np.array(
            [
                [B[a_ax] - A[a_ax], C[a_ax] - A[a_ax]],
                [B[b_ax] - A[b_ax], C[b_ax] - A[b_ax]],
            ]
        )
        det = np.linalg.det(m)
        if abs(det) < 1e-14:
            continue
        inv = np.linalg.inv(m)
        uv = d @ inv.T
        u, w = uv[:, 0], uv[:, 1]
        cover = (u > 0) & (w > 0) & (u + w < 1)  # strict: tests avoid edges
        z = A[axis] + u * (B[axis] - A[axis]) + w * (C[axis] - A[axis])
        inside += (cover & (z > p[:, axis])).astype(np.int64)
    return (inside & 1).astype(bool)


def closest_hit_bruteforce(origins, dirs, verts, tris):
    """Independent float64 Moller-Trumbore closest hit. Returns (t, idx, u, v)."""
    o = np.asarray(origins, dtype=np.float64)
    d = np.asarray(dirs, dtype=np.float64)
    v = np.asarray(verts, dtype=np.float64)
    best_t = np.full(len(o), np.inf)
    best_i = np.full(len(o), -1, dtype=np.int64)
    best_u = np.zeros(len(o))
    best_v = np.zeros(len(o))
    for i, t in enumerate(tris):
        A, B, C = v[t]
        e1, e2 = B - A, C - A
        pvec = np.cross(d, e2)
        det = (e1 * pvec).sum(axis=1)
        ok = np.abs(det) > 1e-14
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tv = o - A
        u = (tv * pvec).sum(axis=1) * inv
        qv = np.cross(tv, e1)
        vv = (d * qv).sum(axis=1) * inv
        tt = (e2 * qv).sum(axis=1) * inv
        hit = ok & (u >= 0) & (vv >= 0) & (u + vv <= 1) & (tt >= 0) & (tt < best_t)
        best_t = np.where(hit, tt, best_t)
        best_i = np.where(hit, i, best_i)
        best_u = np.where(hit, u, best_u)
        best_v = np.where(hit, vv, best_v)
    return best_t, best_i, best_u, best_v


def icosphere_mesh(subdiv=3, radius=0.72, center=(0.05, -0.03, 0.02)):
    """Subdivided icosahedron (smooth radial normals), slightly off-center
    so no direction-cell boundary is hit symmetrically."""
    t = (1 + 5**0.5) / 2
    vs = [(-1, t, 0), (1, t, 0), (-1, -t, 0), (1, -t, 0),
          (0, -1, t), (0, 1, t), (0, -1, -t), (0, 1, -t),
          (t, 0, -1), (t, 0, 1), (-t, 0, -1), (-t, 0, 1)]
    fs = [(0, 11, 5), (0, 5, 1), (0, 1, 7), (0, 7, 10), (0, 10, 11),
          (1, 5, 9), (5, 11, 4), (11, 10, 2), (10, 7, 6), (7, 1, 8),
          (3, 9, 4), (3, 4, 2), (3, 2, 6), (3, 6, 8), (3, 8, 9),
          (4, 9, 5), (2, 4, 11), (6, 2, 10), (8, 6, 7), (9, 8, 1)]
    vs = [np.asarray(v, np.float64) / np.linalg.norm(v) for v in vs]
    for _ in range(subdiv):
        cache, nf = {}, []

        def mid(i, j):
            k = (min(i, j), max(i, j))
            if k not in cache:
                m = vs[i] + vs[j]
                vs.append(m / np.linalg.norm(m))
                cache[k] = len(vs) - 1
            return cache[k]

        for a, b, c in fs:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            nf += [(a, ab, ca), (b, bc, ab), (c, ca, bc), (ab, bc, ca)]
        fs = nf
    unit = np.array(vs, np.float32)
    verts = unit * np.float32(radius) + np.asarray(center, np.float32)
    return verts, unit, np.array(fs, np.int32)
