"""Scene -> SoA device arrays (the TPU-native "upload" layer).

Equivalent of the reference's CPU->GPU conversion
(/root/reference/inc/cpu_to_gpu.hpp:122-199) re-designed for XLA: instead of
arrays-of-`gpu_variant` dispatched per element (inc/gpu_variant.hpp:131-267),
every primitive kind gets its own structure-of-arrays buffer, intersected in
one vectorized pass per kind (SURVEY.md §7 design decision "SoA, not
variants"). Mesh triangles are flattened into the global triangle buffer with
a `tri_mesh` id so the mesh uv-overwrite quirk (default_schema.hpp:138-139)
survives the flattening; the per-mesh AABB gate (default_schema.hpp:99-114)
is superseded by the per-cluster AABB culling in ops/bvh.py (a strictly
finer partition of the same triangles).

Evaluation-order parity: the reference's `ray_cast` scans objects in scene
order and keeps strictly-closer hits (ray_cast.hpp:37-52), so the first
minimal-t object in scene order wins ties. We stamp every primitive with its
`obj` index and, within a mesh, flatten triangles in file order, so a
first-occurrence argmin over (t, obj) reproduces the same winner.

All geometry is float32 (the reference is fp32 end-to-end); indices int32.
Empty kinds are padded with one never-hit sentinel primitive (valid=False)
so every buffer has static nonzero shape under jit.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np

from cutrace_tpu.scene import types as T


def _f32(x):
    return np.asarray(x, dtype=np.float32)


def _i32(x):
    return np.asarray(x, dtype=np.int32)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class SceneArrays:
    """The device scene pytree (analog of gpu_scene_, gpu_types.hpp:263-274).

    Leaf arrays trace through jit/grad; `meta` fields are static (they shape
    the compiled program: buffer sizes, image size, which bounce-tree branches
    exist at all).
    """

    # triangles (standalone + flattened mesh triangles, scene order)
    tri_p1: jax.Array  # (T, 3) f32
    tri_p2: jax.Array  # (T, 3) f32
    tri_p3: jax.Array  # (T, 3) f32
    tri_mat: jax.Array  # (T,) i32
    tri_obj: jax.Array  # (T,) i32
    tri_mesh: jax.Array  # (T,) i32  mesh slot, -1 for standalone triangles
    tri_valid: jax.Array  # (T,) bool

    # planes
    pl_point: jax.Array  # (P, 3) f32
    pl_normal: jax.Array  # (P, 3) f32
    pl_mat: jax.Array  # (P,) i32
    pl_obj: jax.Array  # (P,) i32
    pl_valid: jax.Array  # (P,) bool

    # spheres
    sp_center: jax.Array  # (S, 3) f32
    sp_radius: jax.Array  # (S,) f32
    sp_mat: jax.Array  # (S,) i32
    sp_obj: jax.Array  # (S,) i32
    sp_valid: jax.Array  # (S,) bool

    # materials (phong_material, default_schema.hpp:319-343)
    mat_color: jax.Array  # (K, 3) f32
    mat_specular: jax.Array  # (K,) f32
    mat_reflect: jax.Array  # (K,) f32
    mat_phong: jax.Array  # (K,) f32
    mat_transparency: jax.Array  # (K,) f32

    # lights (sun / point, default_schema.hpp:267-311)
    light_kind: jax.Array  # (L,) i32  0=sun, 1=point
    light_vec: jax.Array  # (L, 3) f32  sun: direction; point: position
    light_color: jax.Array  # (L, 3) f32
    light_valid: jax.Array  # (L,) bool

    # camera (default_schema.hpp:350-398); basis precomputed by look_at
    # Recentering origin for intersection math: midpoint of the scene's
    # authored geometry (triangle vertices, sphere centers, plane anchor
    # points, camera eye). All casts shift positions by this before any
    # product, restoring the reference's subtract-first f32 conditioning
    # (see ops/intersect.py cast_triangles). Static per scene — using e.g.
    # a batch mean instead would couple results to batch composition (and
    # to shard boundaries on a mesh): one horizon-grazing plane hit at
    # t ~ 1e7 would drag the origin astronomically far away.
    scene_center: jax.Array  # (3,) f32

    cam_eye: jax.Array  # (3,) f32
    cam_forward: jax.Array  # (3,) f32
    cam_right: jax.Array  # (3,) f32
    cam_up: jax.Array  # (3,) f32
    ambient: jax.Array  # () f32

    # -- static metadata (compile-time, like the reference's template params) --
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))
    n_objects: int = dataclasses.field(metadata=dict(static=True))
    n_lights: int = dataclasses.field(metadata=dict(static=True))
    # Bounce-tree pruning: when no material reflects / is transparent, the
    # corresponding child branch of shading.hpp:126-150 can never spawn, so
    # it is pruned from the compiled program entirely.
    any_reflective: bool = dataclasses.field(metadata=dict(static=True))
    any_transparent: bool = dataclasses.field(metadata=dict(static=True))
    # Upper bound on shadow-march steps (shading.hpp:22-45). With no
    # transparent materials one occluder saturates the march.
    shadow_steps: int = dataclasses.field(metadata=dict(static=True))
    # Real (non-padding) primitive counts per kind: empty kinds keep a
    # 1-row sentinel buffer for static shapes, and kernels statically skip
    # the whole kind when the count is 0 (the padding row can never hit).
    n_planes: int = dataclasses.field(default=0, metadata=dict(static=True))
    n_spheres: int = dataclasses.field(default=0, metadata=dict(static=True))
    # Whether bounce chains commonly terminate on HITS: a reflection
    # (transparency) child's weight zeroes whenever the hit material's
    # reflect (transparency) factor is < 1e-6 (shading.hpp:130,141). When
    # True the fused kernel's per-node tile-dead skip pays for its
    # vector->scalar sync (mirror.json: 4.6x frame win); when False (every
    # material spawns, chains die only by leaving the scene — bunny.json)
    # the skip is a measured ~1.5 % net loss and is compiled out.
    chains_die: bool = dataclasses.field(default=True,
                                         metadata=dict(static=True))


# Padding sentinels for empty primitive kinds: *finite* geometry parked far
# from any scene (valid=False keeps it from ever hitting). Finite (not NaN)
# matters for jax.grad: a NaN anywhere in the forward creates NaN * 0 = NaN
# in the backward even through jnp.where masks.
_FAR = 1.0e8
_PAD_TRI = (
    np.asarray([[_FAR, 0.0, 0.0]], np.float32),
    np.asarray([[_FAR, 64.0, 0.0]], np.float32),
    np.asarray([[_FAR, 0.0, 64.0]], np.float32),
)
_PAD_PLANE = (
    np.asarray([[_FAR, _FAR, _FAR]], np.float32),  # point
    np.asarray([[0.0, 1.0, 0.0]], np.float32),  # normal (y-up: finite uv axes)
)
_PAD_SPHERE = np.asarray([[_FAR, -_FAR, _FAR]], np.float32)


def host_triangle_soup(scene: T.Scene):
    """The triangle rows of the SoA, on host, in scene_to_soa's exact
    order (object order; a mesh's triangles in file order). Returns numpy
    `(p1 (T,3), p2, p3, valid (T,))` with the same never-hit sentinel
    padding as scene_to_soa. Used to build acceleration structures without
    a device->host readback (the dev tunnel makes device_get of even tiny
    arrays cost seconds)."""
    tp1, tp2, tp3 = [], [], []
    for obj in scene.objects:
        if isinstance(obj, T.Triangle):
            tp1.append(obj.p1)
            tp2.append(obj.p2)
            tp3.append(obj.p3)
        elif isinstance(obj, T.Mesh):
            v = obj.vertices
            tp1.append(v[:, 0])
            tp2.append(v[:, 1])
            tp3.append(v[:, 2])
    if not tp1:
        return (_PAD_TRI[0].copy(), _PAD_TRI[1].copy(), _PAD_TRI[2].copy(),
                np.zeros(1, bool))
    p1 = np.concatenate([np.reshape(p, (-1, 3)) for p in tp1]).astype(np.float32)
    p2 = np.concatenate([np.reshape(p, (-1, 3)) for p in tp2]).astype(np.float32)
    p3 = np.concatenate([np.reshape(p, (-1, 3)) for p in tp3]).astype(np.float32)
    return p1, p2, p3, np.ones(len(p1), bool)


def scene_to_soa(scene: T.Scene, shadow_steps: int = 16) -> SceneArrays:
    """Flatten a CPU scene into the device SoA pytree.

    The vectorized shadow march runs a fixed number of steps. Every
    occluder adds at least (1 - t_max) opacity (t_max = the scene's largest
    material transparency), and the reference's unbounded march
    (shading.hpp:22-45) stops at accumulated opacity >= 1, so
    ceil(1 / (1 - t_max)) steps reproduce it exactly; `shadow_steps` is
    only a safety cap on that (it binds when t_max >= 1 - 1/cap — at
    exactly t_max == 1 the reference never terminates at all).
    """
    tp1, tp2, tp3, tmat, tobj, tmesh = [], [], [], [], [], []
    n_meshes = 0
    plp, pln, plm, plo = [], [], [], []
    spc, spr, spm, spo = [], [], [], []

    for i, obj in enumerate(scene.objects):
        if isinstance(obj, T.Triangle):
            tp1.append(obj.p1)
            tp2.append(obj.p2)
            tp3.append(obj.p3)
            tmat.append(obj.mat_idx)
            tobj.append(i)
            tmesh.append(-1)
        elif isinstance(obj, T.Mesh):
            mesh_id = n_meshes
            n_meshes += 1
            for tri in obj.vertices:
                tp1.append(tri[0])
                tp2.append(tri[1])
                tp3.append(tri[2])
                tmat.append(obj.mat_idx)
                tobj.append(i)
                tmesh.append(mesh_id)
        elif isinstance(obj, T.Plane):
            plp.append(obj.point)
            pln.append(obj.normal)
            plm.append(obj.mat_idx)
            plo.append(i)
        elif isinstance(obj, T.Sphere):
            spc.append(obj.center)
            spr.append(obj.radius)
            spm.append(obj.mat_idx)
            spo.append(i)
        else:
            raise TypeError(f"unknown scene object {obj!r}")

    def pad3(lst, sentinel):
        return (np.stack(lst).astype(np.float32), np.ones(len(lst), bool)) if lst \
            else (sentinel.copy(), np.zeros(1, bool))

    def pad1(lst, dtype, fill=0):
        return np.asarray(lst if lst else [fill], dtype=dtype)

    tri_p1, tri_valid = pad3(tp1, _PAD_TRI[0])
    tri_p2, _ = pad3(tp2, _PAD_TRI[1])
    tri_p3, _ = pad3(tp3, _PAD_TRI[2])
    pl_point, pl_valid = pad3(plp, _PAD_PLANE[0])
    pl_normal, _ = pad3(pln, _PAD_PLANE[1])
    sp_center, sp_valid = pad3(spc, _PAD_SPHERE)

    mats = scene.materials or [T.SolidMaterial(color=(0.0, 0.0, 0.0))]
    mat_color = np.stack([m.color for m in mats]).astype(np.float32)
    mat_specular = np.asarray([m.specular for m in mats], np.float32)
    mat_reflect = np.asarray([m.reflect for m in mats], np.float32)
    mat_phong = np.asarray([m.phong for m in mats], np.float32)
    mat_transp = np.asarray([m.transparency for m in mats], np.float32)

    lights = scene.lights
    if lights:
        light_kind = np.asarray(
            [T.LIGHT_SUN if isinstance(l, T.Sun) else T.LIGHT_POINT for l in lights],
            np.int32,
        )
        light_vec = np.stack(
            [l.direction if isinstance(l, T.Sun) else l.point for l in lights]
        ).astype(np.float32)
        light_color = np.stack([l.color for l in lights]).astype(np.float32)
        light_valid = np.ones(len(lights), bool)
    else:
        light_kind = np.zeros(1, np.int32)
        light_vec = np.asarray([[0.0, 0.0, 1.0]], np.float32)
        light_color = np.zeros((1, 3), np.float32)
        light_valid = np.zeros(1, bool)

    cam = scene.camera
    forward, right, up = cam.basis()

    anchor_pts = [np.asarray(cam.eye, np.float32).reshape(1, 3)]
    if tp1:
        anchor_pts += [np.stack(tp1), np.stack(tp2), np.stack(tp3)]
    if spc:
        anchor_pts.append(np.stack(spc))
    if plp:
        anchor_pts.append(np.stack(plp))
    pts = np.concatenate([p.reshape(-1, 3) for p in anchor_pts]).astype(np.float64)
    scene_center = ((pts.min(0) + pts.max(0)) / 2.0).astype(np.float32)

    any_reflective = bool((mat_reflect >= 1e-6).any())
    any_transparent = bool((mat_transp >= 1e-6).any())
    # Node-death statics for the fused kernel's tile-skip (see SceneArrays.
    # chains_die): two-branch trees always have (exponentially many) dead
    # nodes; single chains die on hits only if some material doesn't spawn.
    if any_reflective and any_transparent:
        chains_die = True
    elif any_reflective:
        chains_die = bool((mat_reflect < 1e-6).any())
    elif any_transparent:
        chains_die = bool((mat_transp < 1e-6).any())
    else:
        chains_die = False
    t_max = float(mat_transp.max()) if len(mats) else 0.0
    if t_max >= 1.0:
        # The reference's march never terminates at transparency == 1
        # (each occluder adds 0 opacity); any finite cap deviates.
        exact_steps = shadow_steps + 1
    else:
        exact_steps = int(np.ceil(1.0 / (1.0 - t_max)))
    if exact_steps > shadow_steps:
        import warnings

        warnings.warn(
            f"scene has material transparency {t_max:.4f}: the exact shadow "
            f"march needs {exact_steps} steps but is capped at "
            f"{shadow_steps}; stacked transparent occluders may "
            f"under-accumulate shadow opacity vs the reference's unbounded "
            f"march (shading.hpp:22-45). Raise scene_to_soa(shadow_steps=)"
            f" to restore exactness.",
            stacklevel=2,
        )

    # Build every leaf as numpy, then upload the WHOLE pytree in one
    # jax.device_put: per-field transfers cost a round trip each over the
    # dev tunnel (~10 s for a 16k-triangle scene; batched: one trip).
    return jax.device_put(SceneArrays(
        tri_p1=_f32(tri_p1),
        tri_p2=_f32(tri_p2),
        tri_p3=_f32(tri_p3),
        tri_mat=_i32(pad1(tmat, np.int32)),
        tri_obj=_i32(pad1(tobj, np.int32)),
        tri_mesh=_i32(pad1(tmesh, np.int32)),
        tri_valid=np.asarray(tri_valid),
        pl_point=_f32(pl_point),
        pl_normal=_f32(pl_normal),
        pl_mat=_i32(pad1(plm, np.int32)),
        pl_obj=_i32(pad1(plo, np.int32)),
        pl_valid=np.asarray(pl_valid),
        sp_center=_f32(sp_center),
        sp_radius=_f32(pad1(spr, np.float32, 1)),
        sp_mat=_i32(pad1(spm, np.int32)),
        sp_obj=_i32(pad1(spo, np.int32)),
        sp_valid=np.asarray(sp_valid),
        mat_color=_f32(mat_color),
        mat_specular=_f32(mat_specular),
        mat_reflect=_f32(mat_reflect),
        mat_phong=_f32(mat_phong),
        mat_transparency=_f32(mat_transp),
        light_kind=_i32(light_kind),
        light_vec=_f32(light_vec),
        light_color=_f32(light_color),
        light_valid=np.asarray(light_valid),
        scene_center=_f32(scene_center),
        cam_eye=_f32(cam.eye),
        cam_forward=_f32(forward),
        cam_right=_f32(right),
        cam_up=_f32(up),
        ambient=_f32(cam.ambient),
        width=cam.width,
        height=cam.height,
        n_objects=len(scene.objects),
        n_lights=len(lights),
        any_reflective=any_reflective,
        any_transparent=any_transparent,
        shadow_steps=min(max(exact_steps, 1), shadow_steps),
        n_planes=len(plp),
        n_spheres=len(spc),
        chains_die=chains_die,
    ))
