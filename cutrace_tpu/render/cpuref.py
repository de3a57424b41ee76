"""Scalar CPU reference renderer — the golden-image generator.

A deliberately simple, per-pixel, recursive transcription of the reference
renderer's exact semantics (SURVEY.md §3.4), used to validate the vectorized
JAX/Pallas device path. Every function cites the reference file:line it
mirrors. Pure Python floats (double precision) — the tolerance gate between
this and the fp32 device path is the BASELINE's allclose <= 1e-3.

Intentionally preserved reference quirks:
  * triangle normal = -(p2-p3) x (p1-p3), never flipped toward the ray
    (default_schema.hpp:72 — the README's "buggy normal map");
  * mesh hits overwrite tex coords with (hit.x, hit.y)
    (default_schema.hpp:138-139);
  * transparency continues the ray *straight* (no refraction bending) and
    blends after reflection was already added (shading.hpp:141-149);
  * sphere t is parametric w.r.t. the *normalized* direction
    (default_schema.hpp:227-245) while triangle/plane use the raw direction
    — equivalent here because every traced ray is normalized;
  * shadow marching accumulates (1 - transparency) per occluder starting
    at last_hit + 1e-3 (shading.hpp:22-45).
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from typing import List

import numpy as np

from cutrace_tpu.scene import types as T

INF = float("inf")

# --- tuple vec3 helpers (inc/vector.hpp) -----------------------------------


def _sub(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _add(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _mul(s, a):
    return (s * a[0], s * a[1], s * a[2])


def _had(a, b):
    return (a[0] * b[0], a[1] * b[1], a[2] * b[2])


def _dot(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _norm(a):
    return math.sqrt(_dot(a, a))


def _normalize(a):
    n = _norm(a)
    if n == 0.0 or math.isnan(n):
        # C float semantics: 0/0 = NaN (a zero vector normalizes to NaN,
        # it does not raise — vector.hpp normalized() on a sun with
        # direction (0,0,0)). Python float division would raise instead.
        return (math.nan, math.nan, math.nan)
    return (a[0] / n, a[1] / n, a[2] / n)


def _reflect(incoming, normal):
    # vector.hpp:204-206
    return _sub(incoming, _mul(2.0 * _dot(normal, incoming), normal))


def _triple(a, b, c):
    """det of the column matrix [a b c] (vector.hpp:211-231)."""
    return _dot(a, _cross(b, c))


# --- primitive intersections (inc/default_schema.hpp) ----------------------


def intersect_triangle(p1, p2, p3, o, d, min_t):
    """Cramer's-rule barycentric intersect (default_schema.hpp:57-78).
    Returns (t, point, normal, uv) or None."""
    a = _sub(p2, p1)
    b = _sub(p2, p3)
    c = d
    dd = _sub(p2, o)

    alpha = _triple(a, b, c)
    if alpha == 0.0:
        return None
    beta = _triple(dd, b, c) / alpha
    gamma = _triple(a, dd, c) / alpha
    t0 = _triple(a, b, dd) / alpha

    if beta >= 0 and gamma >= 0 and beta + gamma <= 1 and math.isfinite(t0) and min_t <= t0:
        hit = _add(o, _mul(t0, d))
        normal = _normalize(_mul(-1.0, _cross(_sub(p2, p3), _sub(p1, p3))))
        # uv_for (default_schema.hpp:37-46)
        p2p1 = _sub(p2, p1)
        p3p1 = _sub(p3, p1)
        xp1 = _sub(hit, p1)
        u = abs(_dot(xp1, p2p1)) / _dot(p2p1, p2p1)
        v = abs(_dot(xp1, p3p1)) / _dot(p3p1, p3p1)
        return (t0, hit, normal, (u, v))
    return None


def aabb_intersects(bmin, bmax, o, d):
    """Slab test, tavianator variant with tmin=0 (default_schema.hpp:99-114)."""
    tmin, tmax = 0.0, INF
    for k in range(3):
        inv = 1.0 / d[k] if d[k] != 0.0 else math.copysign(INF, d[k])
        t1 = (bmin[k] - o[k]) * inv
        t2 = (bmax[k] - o[k]) * inv
        tmin = min(max(t1, tmin), max(t2, tmin))
        tmax = max(min(t1, tmax), min(t2, tmax))
    return tmin <= tmax


def intersect_mesh(tris, bmin, bmax, o, d, min_t):
    """AABB gate then linear triangle scan; tex coords overwritten with
    (hit.x, hit.y) (default_schema.hpp:125-144)."""
    if not aabb_intersects(bmin, bmax, o, d):
        return None
    best = None
    for (p1, p2, p3) in tris:
        r = intersect_triangle(p1, p2, p3, o, d, min_t)
        if r is not None and (best is None or r[0] < best[0]):
            best = r
    if best is None:
        return None
    t, hit, normal, _ = best
    return (t, hit, normal, (hit[0], hit[1]))


def intersect_plane(point, pnormal, o, d, min_t):
    """Point+normal plane (default_schema.hpp:189-201); uv per :169-178
    (degenerate/NaN when the normal is parallel to z — preserved)."""
    denom = _dot(d, pnormal)
    if denom == 0.0:
        return None
    t0 = _dot(_sub(point, o), pnormal) / denom
    if math.isfinite(t0) and min_t <= t0:
        hit = _add(o, _mul(t0, d))
        ax1v = (pnormal[1], -pnormal[0], 0.0)
        n1 = _norm(ax1v)
        # normal parallel to z -> 0/0 -> NaN uv, as in the reference
        ax1 = (
            (ax1v[0] / n1, ax1v[1] / n1, ax1v[2] / n1)
            if n1 > 0.0
            else (float("nan"),) * 3
        )
        ax2 = _cross(pnormal, ax1)
        mod_pt = _sub(point, hit)
        return (t0, hit, pnormal, (_dot(ax1, mod_pt), _dot(ax2, mod_pt)))
    return None


def intersect_sphere(center, radius, o, d, min_t):
    """Quadratic with both roots; t parametric w.r.t. normalized dir;
    spherical uv (default_schema.hpp:226-251)."""
    dn = _normalize(d)
    ec = _sub(o, center)
    dec = -_dot(dn, ec)
    sub = dec * dec - (_dot(ec, ec) - radius * radius)
    if sub < 0:
        return None
    sq = math.sqrt(sub)
    t0, t1 = dec - sq, dec + sq
    t0v = math.isfinite(t0) and min_t <= t0
    t1v = math.isfinite(t1) and min_t <= t1
    if not (t0v or t1v):
        return None
    if t0v and t1v:
        dist = min(t0, t1)
    elif t0v:
        dist = t0
    else:
        dist = t1
    hit = _add(o, _mul(dist, dn))
    normal = _normalize(_sub(hit, center))
    u = 0.5 + math.atan2(normal[2], normal[0]) / (2.0 * math.pi)
    v = 0.5 + math.asin(max(-1.0, min(1.0, normal[1]))) / math.pi
    return (dist, hit, normal, (u, v))


# --- scene prep -------------------------------------------------------------


@dataclass
class _Prim:
    kind: str
    data: tuple
    mat_idx: int


def _prep(scene: T.Scene) -> List[_Prim]:
    prims = []
    for obj in scene.objects:
        if isinstance(obj, T.Triangle):
            prims.append(
                _Prim("tri", (tuple(map(float, obj.p1)), tuple(map(float, obj.p2)), tuple(map(float, obj.p3))), obj.mat_idx)
            )
        elif isinstance(obj, T.Mesh):
            tris = [
                (tuple(map(float, t[0])), tuple(map(float, t[1])), tuple(map(float, t[2])))
                for t in obj.vertices
            ]
            bmin, bmax = obj.bounding_box()
            prims.append(
                _Prim("mesh", (tris, tuple(map(float, bmin)), tuple(map(float, bmax))), obj.mat_idx)
            )
        elif isinstance(obj, T.Plane):
            prims.append(
                _Prim("plane", (tuple(map(float, obj.point)), tuple(map(float, obj.normal))), obj.mat_idx)
            )
        elif isinstance(obj, T.Sphere):
            prims.append(
                _Prim("sphere", (tuple(map(float, obj.center)), float(obj.radius)), obj.mat_idx)
            )
        else:
            raise TypeError(f"unknown object {obj!r}")
    return prims


def _intersect(prim: _Prim, o, d, min_t):
    if prim.kind == "tri":
        return intersect_triangle(*prim.data, o, d, min_t)
    if prim.kind == "mesh":
        return intersect_mesh(*prim.data, o, d, min_t)
    if prim.kind == "plane":
        return intersect_plane(*prim.data, o, d, min_t)
    return intersect_sphere(*prim.data, o, d, min_t)


# --- ray cast / shading (inc/ray_cast.hpp, inc/shading.hpp) -----------------


def ray_cast(prims, o, d, min_dist):
    """Nearest-hit linear scan over objects in scene order
    (ray_cast.hpp:29-55). Returns (t, hit_id, point, normal, uv) or None."""
    best = None
    for i, prim in enumerate(prims):
        r = _intersect(prim, o, d, min_dist)
        if r is not None:
            t = r[0]
            if t > min_dist and (best is None or t < best[0]):
                best = (t, i, r[1], r[2], r[3])
    return best


def shadow_intensity(prims, materials, o, d, max_dist):
    """Shadow march accumulating (1 - transparency) (shading.hpp:22-45)."""
    intensity = 0.0
    last_hit = 0.0
    while True:
        hit = ray_cast(prims, o, d, last_hit + 1e-3)
        if hit is None or not (hit[0] < max_dist):
            return intensity
        mat = materials[prims[hit[1]].mat_idx]
        intensity += 1.0 - mat.transparency
        if intensity >= 1.0:
            return 1.0
        last_hit = hit[0]


def _light_dir_dist(light, point):
    """get_direction_to (default_schema.hpp:280-283, 305-308): sun gives the
    raw -direction with infinite distance; point light a normalized
    direction with euclidean distance."""
    if isinstance(light, T.Sun):
        return _mul(-1.0, tuple(map(float, light.direction))), INF
    lp = tuple(map(float, light.point))
    diff = _sub(lp, point)
    return _normalize(diff), _norm(diff)


def phong(prims, materials, lights, o, d, hit_point, hit_id, normal, ambient):
    """Phong shading with shadows (shading.hpp:64-99)."""
    mat = materials[prims[hit_id].mat_idx]
    diffuse = tuple(map(float, mat.color))
    specular = _mul(mat.specular, diffuse)  # get_phong_params: spec = s * color
    final = _mul(ambient, diffuse)

    for light in lights:
        direction, distance = _light_dir_dist(light, hit_point)
        sdir = _normalize(direction)
        light_dist = distance * _norm(direction)
        color = tuple(map(float, light.color))
        nn = _normalize(normal)

        shadow_fac = shadow_intensity(prims, materials, hit_point, sdir, light_dist)
        if shadow_fac < 1.0:
            fd = max(0.0, _dot(nn, sdir))
            ld = _had(diffuse, color)
            hvec = _normalize(_add(_mul(-1.0, _normalize(d)), sdir))
            fs = max(0.0, _dot(nn, hvec)) ** mat.phong
            ls = _had(specular, color)
            final = _add(final, _mul(1.0 - shadow_fac, _add(_mul(fd, ld), _mul(fs, ls))))
    return final


def ray_color(prims, materials, lights, o, d, min_t, ambient, bounces):
    """Recursive bounce tree: reflection adds, transparency blends after
    (shading.hpp:116-154)."""
    hit = ray_cast(prims, o, d, min_t)
    if hit is None:
        return (0.0, 0.0, 0.0)
    t, hid, point, normal, _uv = hit
    rgb = phong(prims, materials, lights, o, d, point, hid, normal, ambient)

    if bounces > 0:
        mat = materials[prims[hid].mat_idx]
        if mat.reflect >= 1e-6:
            ro = _add(o, _mul(t, d))
            rd = _reflect(_normalize(d), _normalize(normal))
            r_rgb = ray_color(prims, materials, lights, ro, rd, min_t, ambient, bounces - 1)
            rgb = _add(rgb, _mul(mat.reflect, r_rgb))
        if mat.transparency >= 1e-6:
            po = _add(o, _mul(t, d))
            t_rgb = ray_color(prims, materials, lights, po, d, min_t, ambient, bounces - 1)
            rgb = _add(_mul(1.0 - mat.transparency, rgb), _mul(mat.transparency, t_rgb))
    return rgb


# --- driver (inc/kernel.hpp render_kernel / render) -------------------------


def get_ray(cam: T.Camera, x: float, y: float):
    """Pinhole ray for pixel (x, y) (default_schema.hpp:376-386)."""
    forward, right, up = cam.basis()
    forward = tuple(map(float, forward))
    right = tuple(map(float, right))
    up = tuple(map(float, up))
    eye = tuple(map(float, cam.eye))
    aspect = cam.width / cam.height
    xv = _mul((x / cam.width - 0.5) * aspect, right)
    yv = _mul(0.5 - y / cam.height, up)
    return eye, _normalize(_add(_add(xv, yv), forward))


def render_pixels(scene: T.Scene, pixels, bounces: int = 5, fudge: float = 1e-3):
    """Render a list of (x, y) pixels; returns (color, depth, normal) arrays
    of shape (len(pixels), 3), (len,), (len, 3). Mirrors render_kernel
    (kernel.hpp:35-60): one primary cast feeds depth+normal, ray_color the
    color (the reference recomputes the primary cast inside ray_color; the
    values are identical)."""
    prims = _prep(scene)
    mats = scene.materials
    lights = scene.lights
    amb = scene.camera.ambient

    colors = np.zeros((len(pixels), 3), np.float64)
    depths = np.full((len(pixels),), INF, np.float64)
    normals = np.zeros((len(pixels), 3), np.float64)

    for i, (x, y) in enumerate(pixels):
        o, d = get_ray(scene.camera, x, y)
        hit = ray_cast(prims, o, d, fudge)
        if hit is not None:
            depths[i] = hit[0]
            normals[i] = hit[3]
        colors[i] = ray_color(prims, mats, lights, o, d, fudge, amb, bounces)
    return colors, depths, normals


def render_cpu(scene: T.Scene, bounces: int = 5, fudge: float = 1e-3):
    """Full-image scalar render. Returns (color (h,w,3), depth (h,w),
    normal (h,w,3)) float64 arrays. Use only for small images/tests."""
    w, h = scene.camera.width, scene.camera.height
    pixels = [(x, y) for y in range(h) for x in range(w)]
    c, d, n = render_pixels(scene, pixels, bounces, fudge)
    return c.reshape(h, w, 3), d.reshape(h, w), n.reshape(h, w, 3)
