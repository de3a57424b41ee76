"""Native C++ runtime components (native/ -> libcutrace_native.so).

Skipped when no C++ toolchain is available; the Python fallbacks are
covered by the rest of the suite either way.
"""

import numpy as np
import pytest

from cutrace_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library not built"
)


def test_stl_matches_python_parser(scenes_dir):
    from cutrace_tpu.scene import stl as pystl

    for name in ("bunny", "skull", "frame", "mirror"):
        a = native.stl_parse(scenes_dir / f"{name}.stl")
        with open(scenes_dir / f"{name}.stl", "rb") as f:
            data = f.read()
        b = pystl._parse_binary(data)
        assert np.array_equal(a, b), name


def test_stl_ascii(tmp_path):
    f = tmp_path / "tri.stl"
    f.write_text(
        "solid t\n facet normal 0 0 1\n  outer loop\n"
        "   vertex 0 0 0\n   vertex 1 0 0\n   vertex 0 1 0\n"
        "  endloop\n endfacet\nendsolid t\n"
    )
    tris = native.stl_parse(f)
    assert tris.shape == (1, 3, 3)
    assert np.allclose(tris[0], [[0, 0, 0], [1, 0, 0], [0, 1, 0]])


def test_stl_errors(tmp_path):
    with pytest.raises(OSError):
        native.stl_parse(tmp_path / "missing.stl")
    bad = tmp_path / "bad.stl"
    bad.write_bytes(b"solid x\nfacet vertex nope nope nope")
    with pytest.raises(ValueError):
        native.stl_parse(bad)


def test_jpeg_roundtrip(tmp_path):
    """Native baseline JPEG must decode (PIL) close to the source — within
    the same error band PIL's own encoder produces at quality 90."""
    from PIL import Image

    rng = np.random.default_rng(7)
    # smooth gradient + blocks: JPEG-friendly content
    y, x = np.mgrid[0:64, 0:96]
    img = np.stack(
        [(x * 255 // 96), (y * 255 // 64), ((x + y) * 255 // 160)], axis=-1
    ).astype(np.uint8)
    native.jpeg_write(tmp_path / "a.jpg", img, 90)
    dec = np.asarray(Image.open(tmp_path / "a.jpg"))
    assert dec.shape == img.shape
    err = np.abs(dec.astype(int) - img.astype(int)).mean()
    assert err < 4.0, f"native JPEG error too high: {err}"


def test_jpeg_odd_dimensions(tmp_path):
    from PIL import Image

    img = np.full((13, 21, 3), 128, np.uint8)
    img[:, :10] = [200, 40, 90]
    native.jpeg_write(tmp_path / "odd.jpg", img, 90)
    dec = np.asarray(Image.open(tmp_path / "odd.jpg"))
    assert dec.shape == (13, 21, 3)
    assert np.abs(dec.astype(int) - img.astype(int)).mean() < 6.0


def test_cluster_builder_matches_python(scenes_dir):
    from cutrace_tpu.ops.bvh import build_clusters
    from cutrace_tpu.scene.loader import load_scene
    from cutrace_tpu.scene.soa import scene_to_soa

    soa = scene_to_soa(load_scene(scenes_dir / "bunny.json"))
    p1, p2, p3 = (np.asarray(x) for x in (soa.tri_p1, soa.tri_p2, soa.tri_p3))
    cent = (p1 + p2 + p3) / 3.0
    perm, starts, counts = native.build_clusters(cent, 64)
    assert sorted(perm.tolist()) == list(range(len(cent)))
    assert counts.sum() == len(cent)
    # build_clusters (which now prefers the native path) stays consistent
    cl = build_clusters(soa, 64)
    order = np.asarray(cl.order)[np.asarray(cl.valid)]
    native_order = np.concatenate(
        [perm[s:s + c] for s, c in zip(starts, counts)]
    )
    assert np.array_equal(order, native_order)
