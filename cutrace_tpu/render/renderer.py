"""Jitted device renderer — the host driver around the batched ray pipeline.

TPU-native equivalent of the reference's `render` host orchestration and
`render_kernel` (/root/reference/inc/kernel.hpp:35-130): instead of one CUDA
thread per pixel, the flattened pixel array is processed in fixed-size ray
chunks via `lax.map` (one traced program, sequentially pipelined over chunks
by XLA), each chunk running ray-gen -> ray_cast -> unrolled bounce shading.

Per kernel.hpp:46-59 the primary cast feeds the depth and normal buffers
(miss: depth=+inf, normal=0) and `ray_color` produces the color buffer.
The reference recomputes the primary cast inside ray_color; we do too (the
first tree node *is* that recomputation), keeping semantics identical while
XLA CSEs what it can.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from cutrace_tpu.ops import intersect as I
from cutrace_tpu.render import shading as sh
from cutrace_tpu.scene.soa import SceneArrays, scene_to_soa


@dataclasses.dataclass(frozen=True)
class PreparedScene:
    """A scene plus its acceleration structure (an ops.bvh.Accel partition,
    or None for brute force).

    Build once per scene with `prepare()`. The Accel stores only the
    triangle PARTITION; geometry is gathered from the live soa inside the
    traced render, so updating `soa` parameters (dataclasses.replace) never
    renders stale geometry and jax.grad flows through the accelerated path
    (ops/bvh.py module docstring). Accel's static fields (kind, interpret)
    key the jit cache; its arrays trace, so re-partitioning after large
    vertex motion does not recompile."""

    soa: SceneArrays
    accel: Optional[object] = None  # ops.bvh.Accel | None


def prepare(scene_or_soa, accel: str = "auto") -> PreparedScene:
    """Build the device scene + acceleration structure.

    accel: "none" (brute force), "clusters" (clustered buffers, no culling
    — the oracle), "pallas" (TPU culling-cast kernel, interpreter on CPU),
    "fused" (whole-pipeline Pallas kernel: cast + shadows + bounce shading
    in one kernel, ops/fused.py — falls back to "pallas" semantics where
    it doesn't apply), or "auto" (fused on TPU)."""
    host_tris = None
    if isinstance(scene_or_soa, SceneArrays):
        soa = scene_or_soa
    else:
        # Build the partition from the host-side scene: over the dev
        # tunnel, reading tri_p* back from the device costs seconds.
        from cutrace_tpu.scene.soa import host_triangle_soup

        host_tris = host_triangle_soup(scene_or_soa)
        soa = scene_to_soa(scene_or_soa)
    n_tris = int(soa.tri_p1.shape[0])
    if accel == "auto":
        # Kernels only pay off compiled on real TPU hardware (interpret
        # mode on CPU is strictly slower than brute force).
        on_tpu = jax.default_backend() == "tpu"
        accel = "fused" if on_tpu else "none"
    if accel == "none":
        return PreparedScene(soa=soa)

    from cutrace_tpu.ops import bvh

    if accel not in ("clusters", "pallas", "fused"):
        raise ValueError(f"unknown accel {accel!r}")
    # Fused-kernel cluster size: the rays-on-lanes kernel (statically
    # unrolled, M <= 31 clusters) is much faster than the sublane
    # fallback, and within its range finer clusters cull more triangle
    # work per visit (bunny 1080p b5: C=64/M=16 = 457 ms vs C=128/M=8 =
    # 535 ms). So pick the smallest C that keeps M <= 31; beyond the
    # lanes range (T > 31*128) the sublane kernel runs with C=128
    # (full-lane (tile_r, C) intersection tiles).
    if accel == "fused":
        import os

        from cutrace_tpu.ops.fused import _LANES_MAX_M

        # Lanes range: C=32 measured slower (129 vs 136 Mcasts/s on bunny:
        # per-cluster unroll overhead beats the finer cull), so 64 is the
        # floor. Sublane (big) scenes: C=256 with the kernel's 128-ray
        # tiles measured best across 64k/256k (256k bunny 960x540 b5:
        # 2.33 s at C=128/tile 512 -> 1.28 s at C=256/tile 128 — round 3;
        # C=512 and tile 256 both slightly worse). CUTRACE_CLUSTER_C
        # overrides for kernel experiments.
        # (scenes small enough for the lanes kernel keep C = 64/128 — the
        # statically-unrolled lanes kernel at C=256 is an untested shape)
        size = 256
        for c in (64, 128):
            if n_tris <= _LANES_MAX_M * c:
                size = c
                break
        from cutrace_tpu.ops.fused import _VMEM_TABLE_SLOTS

        if n_tris > _VMEM_TABLE_SLOTS:
            # HBM-streamed tables: bigger per-visit DMA blocks amortize
            # better (1M tris 480x270 b2: 0.44 s at C=512 vs 0.49 at 256)
            size = 512
        c_env = os.environ.get("CUTRACE_CLUSTER_C")
        if c_env:
            size = int(c_env)
    else:
        size = bvh.CLUSTER_SIZE
    return PreparedScene(
        soa=soa,
        accel=bvh.build_accel(soa, cluster_size=size, kind=accel,
                              host_tris=host_tris),
    )


def camera_rays(soa: SceneArrays, px, py):
    """Pinhole rays for pixel coordinates (default_schema.hpp:376-386):
    dir = normalize(((x/w - 0.5)·aspect)·right + (0.5 - y/h)·up + forward),
    origin = eye. px, py: (R,) arrays of pixel indices (float or int)."""
    w = jnp.float32(soa.width)
    h = jnp.float32(soa.height)
    aspect = w / h
    px = px.astype(jnp.float32)
    py = py.astype(jnp.float32)
    xv = ((px / w - 0.5) * aspect)[:, None] * soa.cam_right[None, :]
    yv = (0.5 - py / h)[:, None] * soa.cam_up[None, :]
    d = xv + yv + soa.cam_forward[None, :]
    d = d / jnp.sqrt(jnp.sum(d * d, axis=-1))[:, None]
    o = jnp.broadcast_to(soa.cam_eye[None, :], d.shape)
    return o, d


def render_rays(soa: SceneArrays, o, d, bounces: int, fudge, tri_candidates=None):
    """One chunk of the pipeline: primary cast (depth/normal) + bounce tree
    (color). Returns (color (R,3), depth (R,), normal (R,3))."""
    primary = I.ray_cast(soa, o, d, fudge, tri_candidates)
    color = sh.ray_color(soa, o, d, fudge, bounces, tri_candidates)
    return color, primary.t, primary.normal


def _ceil_to(x: int, m: int) -> int:
    return -(-x // m) * m


@functools.lru_cache(maxsize=8)
def _block_order(w: int, h: int, n_pad: int, bw: int = 32, bh: int = 16):
    """Pixel visit order that walks 32x16 image blocks instead of scanlines.

    A 512-ray cast tile then covers a compact pixel block rather than a
    512x1 strip, so primary rays (and the shadow rays spawned from their
    hit points) stay spatially coherent for the Pallas cluster culling.
    Per-ray results are order-independent (no batch-dependent reductions
    anywhere), so this changes performance only. Returns (order, inverse)
    int32 arrays of length n_pad; indices >= w*h are padding."""
    import numpy as np

    xs = np.arange(_ceil_to(w, bw))
    ys = np.arange(_ceil_to(h, bh))
    gx, gy = np.meshgrid(xs, ys)
    # sort pixels by (block row, block col, y-in-block, x-in-block)
    key = (
        ((gy // bh) * (10**9))
        + ((gx // bw) * (10**6))
        + ((gy % bh) * (10**3))
        + (gx % bw)
    )
    flat_idx = gy * w + gx
    inside = (gx < w) & (gy < h)
    order = flat_idx[inside].ravel()[np.argsort(key[inside].ravel(),
                                                kind="stable")]
    n = w * h
    order = np.concatenate([order, np.arange(n, n_pad)]).astype(np.int32)
    inverse = np.zeros(n_pad, np.int32)
    inverse[order] = np.arange(n_pad, dtype=np.int32)
    # numpy (not jnp): the cache is shared across jit traces, and a device
    # array created inside one trace would leak its tracer into the next
    return order, inverse


@functools.partial(jax.jit, static_argnames=("bounces", "fudge"))
def _render_fused(soa: SceneArrays, bounces: int, fudge: float, accel):
    """Whole-image render through the fused whole-pipeline kernel
    (ops/fused.py): pixels visit in 32x16 blocks (one kernel tile = one
    compact image block), one pallas_call for the full frame."""
    from cutrace_tpu.ops.fused import TILE_R, fused_render_rays

    n = soa.width * soa.height
    n_pad = _ceil_to(n, TILE_R)
    order, inverse = _block_order(soa.width, soa.height, n_pad)
    idx = order
    o, d = camera_rays(soa, idx % soa.width, idx // soa.width)
    color, depth, normal = fused_render_rays(soa, accel, o, d, fudge, bounces)
    color = color[inverse]
    depth = depth[inverse]
    normal = normal[inverse]
    return (
        color[:n].reshape(soa.height, soa.width, 3),
        depth[:n].reshape(soa.height, soa.width),
        normal[:n].reshape(soa.height, soa.width, 3),
    )


@functools.partial(jax.jit, static_argnames=("bounces", "chunk"))
def _render_padded(
    soa: SceneArrays, fudge, bounces: int, chunk: int, accel=None
):
    from cutrace_tpu.ops.bvh import candidates_fn

    tri_candidates = candidates_fn(accel)
    n = soa.width * soa.height
    n_pad = _ceil_to(n, chunk)
    order, inverse = _block_order(soa.width, soa.height, n_pad)
    idx = order
    px = (idx % soa.width).reshape(-1, chunk)
    py = (idx // soa.width).reshape(-1, chunk)

    def body(xy):
        o, d = camera_rays(soa, xy[0], xy[1])
        return render_rays(soa, o, d, bounces, fudge, tri_candidates)

    color, depth, normal = jax.lax.map(body, (px, py))
    # un-permute from block order back to scanline order
    color = color.reshape(n_pad, 3)[inverse]
    depth = depth.reshape(n_pad)[inverse]
    normal = normal.reshape(n_pad, 3)[inverse]
    return (
        color[:n].reshape(soa.height, soa.width, 3),
        depth[:n].reshape(soa.height, soa.width),
        normal[:n].reshape(soa.height, soa.width, 3),
    )


def render(
    scene_or_soa,
    bounces: int = 5,
    fudge: float = 1e-3,
    chunk: Optional[int] = None,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Render the full image. Returns (color (H,W,3), depth (H,W),
    normal (H,W,3)) float32 device arrays.

    bounces/chunk are compile-time (the reference's template parameters,
    main.cu:30); fudge is the traced min-distance epsilon. `chunk` defaults
    to the whole image for small renders, else 64Ki rays (a multiple of the
    8x128 f32 VPU tile). Accepts a Scene, SceneArrays (both: brute-force
    cast) or a PreparedScene from prepare() (uses its acceleration
    structure)."""
    accel = None
    if isinstance(scene_or_soa, PreparedScene):
        accel = scene_or_soa.accel
        scene_or_soa = scene_or_soa.soa
    soa = (
        scene_or_soa
        if isinstance(scene_or_soa, SceneArrays)
        else scene_to_soa(scene_or_soa)
    )
    if accel is not None and accel.kind == "fused":
        from cutrace_tpu.ops.fused import fused_supported

        if fused_supported(soa, accel, bounces):
            return _render_fused(soa, bounces, float(fudge), accel)
        # out of the fused kernel's scope (big scene / deep two-branch
        # tree): the same partition drives the composable culling cast
    n = soa.width * soa.height
    if chunk is None:
        # Bound peak ray-batch size: the deepest wavefront level carries
        # 2^bounces nodes per pixel when a scene has both reflective and
        # transparent materials, and shadow marches batch all lights into
        # one cast (shading.ray_color / phong). The brute-force and dense
        # cluster casts materialize (rays x triangles) intermediates, so
        # without the culling kernel the light fan-out must also be bounded.
        max_nodes = (
            2**bounces if (soa.any_reflective and soa.any_transparent) else 1
        )
        if accel is None or accel.kind not in ("pallas", "fused"):
            max_nodes *= max(1, soa.n_lights)
        chunk = max(1024, 65536 // max_nodes)
        chunk = min(chunk, _ceil_to(n, 8))
    chunk = max(8, min(chunk, _ceil_to(n, 8)))
    return _render_padded(soa, jnp.float32(fudge), bounces, chunk, accel)
