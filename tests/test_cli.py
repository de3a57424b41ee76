"""CLI contract tests (main.cu parity: usage/exit codes/outputs)."""

from cutrace_tpu import cli
from cutrace_tpu.scene.loader import load_scene


def test_usage_exit_code(scenes_dir, tmp_path):
    """No scene argument: usage on stderr, exit -1 (255) (main.cu:9-12)."""
    rc = cli.main([])
    assert rc == 255


def test_bad_scene_dumps_schema(capsys, tmp_path):
    """Invalid scene: schema dump on stdout, exit -2 (254) (main.cu:16-19)."""
    bad = tmp_path / "bad.json"
    bad.write_text('{"objects": [{"type": "nope"}]}')
    rc = cli.main([str(bad)])
    out = capsys.readouterr().out
    assert rc == 254
    assert "Schema for scene files:" in out
    assert "type 'sphere'" in out


def test_render_outputs(scenes_dir, tmp_path):
    """Happy path through the real process surface: scene dump + timing
    line + three JPEGs (main.cu:21-36)."""
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "cutrace_tpu", str(scenes_dir / "triangle.json"),
         "--out", str(tmp_path), "--bounces", "2", "--platform", "cpu"],
        capture_output=True, text=True, cwd=str(scenes_dir.parent),
    )
    assert proc.returncode == 0, proc.stderr
    assert " -> Have 1    objects:" in proc.stdout
    assert "Render time was" in proc.stdout
    from PIL import Image

    for name in ("frame.jpg", "depth_map.jpg", "normal_map.jpg"):
        img = Image.open(tmp_path / name)
        assert img.size == (20, 20), name


def test_scene_dump_type_indices(scenes_dir):
    """Type indices match the reference's variant ordering
    (triangle=0, mesh=1, plane=2, sphere=3; sun=0, point=1)."""
    import io

    sc = load_scene(scenes_dir / "sphere_plane.json")
    buf = io.StringIO()
    cli.dump_scene(sc, file=buf)
    out = buf.getvalue()
    assert "  -> Object   #0    has type #3 " in out  # sphere
    assert "  -> Object   #3    has type #2 " in out  # plane
    assert "  -> Light    #0    has type #0 " in out  # sun
    assert "  -> Light    #1    has type #1 " in out  # point
