"""Mesh import dispatch: STL (binary/ASCII) and Wavefront OBJ.

The reference imports meshes through Assimp, which accepts many formats
(default_schema.hpp:516-545) — though every bundled asset is binary STL.
For parity with users bringing their own models, OBJ (the other ubiquitous
triangle-soup format) is supported natively here: vertices + faces with
fan triangulation of polygons, matching Assimp's aiProcess_Triangulate
flattening. Unknown extensions fall back to the STL reader (which rejects
gracefully into an empty mesh, the reference's silent-empty behavior).
"""

from __future__ import annotations

import sys

import numpy as np

from cutrace_tpu.scene.stl import load_stl


def load_obj(path: str) -> np.ndarray:
    """Wavefront OBJ -> (N, 3, 3) float32 triangle corners.

    Supports `v x y z` and `f i j k [l ...]` (1-based, negative indices
    relative to the end, `i/t/n` syntax); polygons are fan-triangulated in
    face order (Assimp's Triangulate behavior). Missing/broken files yield
    an empty mesh + stderr warning (reference semantics)."""
    try:
        with open(path, "r", errors="replace") as f:
            lines = f.readlines()
    except OSError as e:
        print(f"warning: could not open mesh file '{path}': {e}",
              file=sys.stderr)
        return np.zeros((0, 3, 3), np.float32)

    verts = []
    tris = []
    for line in lines:
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "v" and len(parts) >= 4:
            verts.append([float(parts[1]), float(parts[2]), float(parts[3])])
        elif parts[0] == "f" and len(parts) >= 4:
            idx = []
            for tok in parts[1:]:
                i = int(tok.split("/")[0])
                idx.append(i - 1 if i > 0 else len(verts) + i)
            for k in range(1, len(idx) - 1):  # fan triangulation
                tris.append((idx[0], idx[k], idx[k + 1]))

    if not verts or not tris:
        print(f"warning: mesh file '{path}' has no triangles",
              file=sys.stderr)
        return np.zeros((0, 3, 3), np.float32)
    v = np.asarray(verts, np.float32)
    t = np.asarray(tris, np.int64)
    if (t < 0).any() or (t >= len(v)).any():
        print(f"warning: mesh file '{path}' has out-of-range indices",
              file=sys.stderr)
        return np.zeros((0, 3, 3), np.float32)
    return v[t]


def load_mesh(path: str) -> np.ndarray:
    """Load a mesh by extension: .obj via the OBJ reader, everything else
    via the STL reader."""
    if str(path).lower().endswith(".obj"):
        return load_obj(path)
    return load_stl(path)


def subdivide(vertices: np.ndarray, levels: int = 1) -> np.ndarray:
    """Midpoint 1:4 subdivision of a triangle soup (N, 3, 3) -> (4^L*N, 3, 3).

    Splits every triangle at its edge midpoints; the union of the four
    children is exactly the parent's surface, so renders of a subdivided
    mesh match the original (up to tie-breaks on shared edges). Used to
    scale scenes to arbitrary triangle counts (the reference loads
    arbitrary-size models through Assimp, default_schema.hpp:516-545)."""
    v = np.asarray(vertices, np.float32).reshape(-1, 3, 3)
    for _ in range(levels):
        p1, p2, p3 = v[:, 0], v[:, 1], v[:, 2]
        m12 = 0.5 * (p1 + p2)
        m23 = 0.5 * (p2 + p3)
        m31 = 0.5 * (p3 + p1)
        v = np.concatenate([
            np.stack([p1, m12, m31], axis=1),
            np.stack([m12, p2, m23], axis=1),
            np.stack([m31, m23, p3], axis=1),
            np.stack([m12, m23, m31], axis=1),
        ])
    return v
