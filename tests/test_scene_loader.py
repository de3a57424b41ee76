"""Scene schema / loader tests.

The reference tests only its either monad (test.cu); SURVEY.md §4 calls for
real loader coverage — the bundled scenes are the fixtures."""

import json

import numpy as np
import pytest

from cutrace_tpu.scene import types as T
from cutrace_tpu.scene.loader import load_file, load_from
from cutrace_tpu.scene.schema import dump_schema
from cutrace_tpu.scene.stl import load_stl


def test_triangle_scene(scenes_dir):
    res = load_file(str(scenes_dir / "triangle.json"))
    assert res.ok
    s = res.scene
    assert len(s.objects) == 1 and isinstance(s.objects[0], T.Triangle)
    assert len(s.lights) == 1 and isinstance(s.lights[0], T.Sun)
    assert len(s.materials) == 1
    assert s.camera.width == 20 and s.camera.height == 20
    assert s.camera.ambient == pytest.approx(0.01)
    np.testing.assert_allclose(s.camera.eye, [0, 0, -5])
    m = s.materials[0]
    # defaults: transparency omitted -> 0 (default_schema.hpp:820)
    assert m.transparency == 0.0 and m.specular == pytest.approx(0.8)


def test_sphere_plane_scene(scenes_dir):
    res = load_file(str(scenes_dir / "sphere_plane.json"))
    assert res.ok
    s = res.scene
    assert len(s.spheres) == 3 and len(s.planes) == 1
    assert len(s.lights) == 2
    assert isinstance(s.lights[0], T.Sun) and isinstance(s.lights[1], T.PointLight)
    assert s.materials[1].transparency == pytest.approx(0.6)
    # object order preserved for tie-break parity
    assert [o.obj_index for o in s.objects] == [0, 1, 2, 3]


def test_bunny_scene_mesh_load(scenes_dir):
    res = load_file(str(scenes_dir / "bunny.json"))
    assert res.ok
    s = res.scene
    meshes = s.meshes
    assert len(meshes) == 1
    # bunny.stl is 1000 binary-STL triangles (84 + 50*1000 bytes)
    assert meshes[0].num_triangles == 1000
    assert len(s.planes) == 5 and len(s.lights) == 4
    bmin, bmax = meshes[0].bounding_box()
    assert np.all(bmin < bmax)


def test_bunny_small_legacy_dialect(scenes_dir):
    """bunny_small.json uses the stale dialect ("model", "position", type-less
    material) that the reference *rejects*; we accept it in compat mode and
    reject it in strict mode (SURVEY.md §4)."""
    res = load_file(str(scenes_dir / "bunny_small.json"), compat=True, quiet=True)
    assert res.ok
    assert len(res.scene.meshes) == 1
    assert res.scene.meshes[0].num_triangles == 1000
    assert len(res.scene.lights) == 4
    # camera has no "ambient" key -> default 0.1 (default_schema.hpp:896)
    assert res.scene.camera.ambient == pytest.approx(0.1)

    strict = load_file(str(scenes_dir / "bunny_small.json"), compat=False, quiet=True)
    assert not strict.ok
    assert len(strict.errors) >= 3  # model + 4 positions + material


def test_mirror_scene(scenes_dir):
    res = load_file(str(scenes_dir / "mirror.json"))
    assert res.ok
    s = res.scene
    assert len(s.meshes) == 3 and len(s.planes) == 5
    tris = [m.num_triangles for m in s.meshes]
    assert tris == [112, 12, 800]  # frame, mirror, skull STL headers
    assert s.materials[3].reflect == pytest.approx(0.999)


def test_element_errors_skip_but_continue(tmp_path):
    """Bad elements are skipped with an error; good ones still load
    (loader.hpp:687-702)."""
    doc = {
        "objects": [
            {"type": "sphere", "material": 0, "center": [0, 0, 0], "radius": 1.0},
            {"type": "sphere", "material": 0, "center": [0, 0, 0]},  # no radius
            {"type": "nonsense", "material": 0},
            {"type": "triangle", "material": 0, "p1": [0, 0]},  # bad vec3
        ],
        "lights": [{"type": "sun", "direction": [1, 1, 1]}],
        "materials": [{"type": "solid", "color": [1, 0, 0]}],
        "camera": {"width": 4, "height": 4},
    }
    res = load_from(doc, quiet=True)
    assert not res.ok
    assert len(res.scene.objects) == 1
    assert len(res.errors) == 3
    # sun color default: white (default_schema.hpp:728)
    np.testing.assert_allclose(res.scene.lights[0].color, [1, 1, 1])
    # material defaults (default_schema.hpp:815-822)
    m = res.scene.materials[0]
    assert (m.specular, m.reflect, m.phong, m.transparency) == (0.3, 0.0, 32.0, 0.0)


def test_missing_top_level_keys(tmp_path):
    res = load_from({"objects": []}, quiet=True)
    assert not res.ok
    assert any("lights" in e for e in res.errors)
    assert any("materials" in e for e in res.errors)
    assert any("camera" in e for e in res.errors)


def test_parse_error_empty_scene(tmp_path):
    p = tmp_path / "broken.json"
    p.write_text("{ not json")
    res = load_file(str(p), quiet=True)
    assert not res.ok and len(res.scene.objects) == 0


def test_missing_mesh_file_is_empty(tmp_path):
    """Assimp-null -> silently empty mesh (default_schema.hpp:523)."""
    doc = {
        "objects": [{"type": "mesh", "material": 0, "file": "does_not_exist.stl"}],
        "lights": [],
        "materials": [{"type": "solid", "color": [1, 1, 1]}],
        "camera": {},
    }
    res = load_from(doc, quiet=True)
    assert res.ok
    assert res.scene.meshes[0].num_triangles == 0
    bmin, bmax = res.scene.meshes[0].bounding_box()
    assert np.all(np.isinf(bmin)) and np.all(np.isinf(bmax))


def test_stl_roundtrip_ascii_and_binary(tmp_path, scenes_dir):
    tris = load_stl(str(scenes_dir / "frame.stl"))
    assert tris.shape == (112, 3, 3)
    # write the same triangles as ASCII and re-read
    lines = ["solid x"]
    for t in tris:
        lines.append("facet normal 0 0 0\nouter loop")
        for v in t:
            lines.append(f"vertex {float(v[0])!r} {float(v[1])!r} {float(v[2])!r}")
        lines.append("endloop\nendfacet")
    lines.append("endsolid x")
    p = tmp_path / "frame_ascii.stl"
    p.write_text("\n".join(lines))
    tris2 = load_stl(str(p))
    np.testing.assert_allclose(tris, tris2, rtol=1e-6)


def test_schema_dump_mentions_all_types():
    text = dump_schema()
    for name in ("triangle", "mesh", "plane", "sphere", "sun", "point", "solid"):
        assert f"'{name}'" in text or f"type '{name}'" in text
    assert "mandatory" in text and "optional" in text


def test_validate_flags_bad_material_refs():
    s = T.Scene(
        objects=[T.Sphere([0, 0, 0], 1.0, mat_idx=5)],
        materials=[T.SolidMaterial([1, 1, 1])],
    ).reindex()
    errs = s.validate()
    assert len(errs) == 1 and "material 5" in errs[0]


def test_obj_mesh_import(tmp_path):
    """OBJ meshes load with fan triangulation and index forms
    (Assimp-parity beyond STL — scene/mesh_io.py)."""
    import json

    import numpy as np

    from cutrace_tpu.scene.loader import load_scene
    from cutrace_tpu.scene.mesh_io import load_obj

    obj = tmp_path / "quad.obj"
    obj.write_text(
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "f 1/1/1 2/2/2 3/3/3 4/4/4\n"  # quad -> 2 triangles (fan)
        "f -4 -3 -2\n"  # negative indices
    )
    tris = load_obj(obj)
    assert tris.shape == (3, 3, 3)
    assert np.allclose(tris[0], [[0, 0, 0], [1, 0, 0], [1, 1, 0]])
    assert np.allclose(tris[1], [[0, 0, 0], [1, 1, 0], [0, 1, 0]])

    scene_file = tmp_path / "s.json"
    scene_file.write_text(json.dumps({
        "camera": {"eye": [0, 0, -3], "look": [0, 0, 0], "width": 8,
                   "height": 8},
        "materials": [{"type": "solid", "color": [1, 0, 0]}],
        "lights": [{"type": "sun", "direction": [0, 0, 1]}],
        "objects": [{"type": "mesh", "file": "quad.obj", "material": 0}],
    }))
    sc = load_scene(scene_file)
    assert sc.objects[0].num_triangles == 3


def test_ply_mesh_import(tmp_path):
    """PLY meshes load in ascii and both binary endiannesses with fan
    triangulation and extra vertex properties skipped (Assimp-parity
    breadth — scene/mesh_io.py)."""
    import json
    import struct

    import numpy as np

    from cutrace_tpu.scene.loader import load_scene
    from cutrace_tpu.scene.mesh_io import load_mesh, load_ply

    quad = [(0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0)]
    want0 = [[0, 0, 0], [1, 0, 0], [1, 1, 0]]
    want1 = [[0, 0, 0], [1, 1, 0], [0, 1, 0]]

    # ascii, with an extra skipped property and a 4-gon face
    ply_a = tmp_path / "quad_ascii.ply"
    ply_a.write_text(
        "ply\nformat ascii 1.0\ncomment made by hand\n"
        "element vertex 4\n"
        "property float x\nproperty float y\nproperty float z\n"
        "property uchar red\n"
        "element face 1\n"
        "property list uchar int vertex_indices\n"
        "end_header\n"
        + "".join(f"{x} {y} {z} 255\n" for x, y, z in quad)
        + "4 0 1 2 3\n"
    )
    tris = load_ply(ply_a)
    assert tris.shape == (2, 3, 3)
    assert np.allclose(tris[0], want0) and np.allclose(tris[1], want1)

    # binary, both endians
    for fmt, bo in (("binary_little_endian", "<"), ("binary_big_endian", ">")):
        ply_b = tmp_path / f"quad_{fmt}.ply"
        body = b"".join(struct.pack(bo + "fff", *v) for v in quad)
        body += struct.pack(bo + "B4i", 4, 0, 1, 2, 3)
        ply_b.write_bytes(
            (
                f"ply\nformat {fmt} 1.0\n"
                "element vertex 4\n"
                "property float x\nproperty float y\nproperty float z\n"
                "element face 1\n"
                "property list uchar int vertex_indices\n"
                "end_header\n"
            ).encode() + body
        )
        tris = load_mesh(ply_b)
        assert tris.shape == (2, 3, 3), fmt
        assert np.allclose(tris[0], want0) and np.allclose(tris[1], want1)

    # scene-level dispatch by extension
    scene_file = tmp_path / "s.json"
    scene_file.write_text(json.dumps({
        "camera": {"eye": [0, 0, -3], "look": [0, 0, 0], "width": 8,
                   "height": 8},
        "materials": [{"type": "solid", "color": [1, 0, 0]}],
        "lights": [{"type": "sun", "direction": [0, 0, 1]}],
        "objects": [{"type": "mesh", "file": "quad_ascii.ply",
                     "material": 0}],
    }))
    sc = load_scene(scene_file)
    assert sc.objects[0].num_triangles == 2

    # broken file -> empty mesh + warning (silent-empty reference
    # semantics, default_schema.hpp:523)
    bad = tmp_path / "bad.ply"
    bad.write_bytes(b"ply\nformat ascii 1.0\nelement vertex 1\n")
    assert load_ply(bad).shape == (0, 3, 3)


def test_host_triangle_soup_matches_soa(scenes_dir):
    """host_triangle_soup (the accel builder's no-readback source) must
    reproduce scene_to_soa's triangle buffers exactly, including sentinel
    padding for triangle-free scenes."""
    from cutrace_tpu.scene.soa import host_triangle_soup, scene_to_soa

    for name in ("bunny.json", "mirror.json", "triangle.json",
                 "sphere_plane.json"):
        sc = load_file(str(scenes_dir / name)).scene
        soa = scene_to_soa(sc)
        p1, p2, p3, valid = host_triangle_soup(sc)
        assert np.array_equal(p1, np.asarray(soa.tri_p1))
        assert np.array_equal(p2, np.asarray(soa.tri_p2))
        assert np.array_equal(p3, np.asarray(soa.tri_p3))
        assert np.array_equal(valid, np.asarray(soa.tri_valid))


def test_mesh_subdivide_preserves_surface():
    """Midpoint subdivision quadruples the count and the children tile the
    parent exactly (same total area, same AABB)."""
    from cutrace_tpu.scene.mesh_io import subdivide

    rng = np.random.default_rng(0)
    v = rng.standard_normal((7, 3, 3)).astype(np.float32)
    s = subdivide(v, 2)
    assert s.shape == (7 * 16, 3, 3)

    def area(tris):
        e1 = tris[:, 1] - tris[:, 0]
        e2 = tris[:, 2] - tris[:, 0]
        return 0.5 * np.linalg.norm(np.cross(e1, e2), axis=1).sum()

    assert np.isclose(area(s), area(v), rtol=1e-5)
    assert np.allclose(s.reshape(-1, 3).min(0), v.reshape(-1, 3).min(0))
    assert np.allclose(s.reshape(-1, 3).max(0), v.reshape(-1, 3).max(0))
