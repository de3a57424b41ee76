"""Image encoder transfer functions — exact parity with images.hpp."""

import numpy as np

from cutrace_tpu.io import images


def test_depth_encoding():
    """byte = 255*(max-v)/max for finite v, else 0; inverted grayscale,
    C-style truncation (images.hpp:26-41)."""
    depth = np.array([[0.0, 1.0, 2.0], [4.0, np.inf, 3.0]], np.float32)
    max_d = images.max_finite_depth(depth)
    assert max_d == 4.0
    out = images.to_depth_bytes(depth, max_d)
    assert out.shape == (2, 3, 3)
    expect = np.array([[255, 191, 127], [0, 0, 63]], np.uint8)
    assert (out[..., 0] == expect).all()
    assert (out[..., 0] == out[..., 1]).all() and (out[..., 0] == out[..., 2]).all()


def test_depth_all_inf():
    depth = np.full((2, 2), np.inf, np.float32)
    assert images.max_finite_depth(depth) == 0.0
    out = images.to_depth_bytes(depth, 0.0)
    assert (out == 0).all()


def test_normal_encoding():
    """0.5 + 0.5*n_hat per channel; zero-length -> black (images.hpp:47-66)."""
    normals = np.array(
        [[[0.0, 0.0, 1.0], [0.0, 0.0, 0.0]], [[2.0, 0.0, 0.0], [0.0, -1.0, 0.0]]],
        np.float32,
    )
    out = images.to_normal_bytes(normals)
    assert tuple(out[0, 0]) == (127, 127, 255)
    assert tuple(out[0, 1]) == (0, 0, 0)  # zero norm
    assert tuple(out[1, 0]) == (255, 127, 127)  # normalized despite len 2
    assert tuple(out[1, 1]) == (127, 0, 127)


def test_color_encoding():
    """clamp [0,1] then *255 truncated (images.hpp:72-88)."""
    color = np.array([[[0.0, 0.5, 1.0], [1.5, -0.25, np.nan]]], np.float32)
    out = images.to_color_bytes(color)
    assert tuple(out[0, 0]) == (0, 127, 255)
    assert tuple(out[0, 1]) == (255, 0, 0)  # clamped; NaN -> 0


def test_jpeg_file_written(tmp_path):
    img = np.zeros((16, 16), np.float32)
    images.write_depth_map(tmp_path / "d.jpg", img + 1.0, 1.0)
    images.write_normal_map(tmp_path / "n.jpg", np.zeros((16, 16, 3), np.float32))
    images.write_colorized(tmp_path / "c.jpg", np.zeros((16, 16, 3), np.float32))
    from PIL import Image

    for f in ("d.jpg", "n.jpg", "c.jpg"):
        assert Image.open(tmp_path / f).size == (16, 16)
