"""Interactive hotkey loop (reference WndProc analog) — headless driving."""

import numpy as np

from dxrvoxelizer_tpu.app import interactive
from dxrvoxelizer_tpu.ez import Engine
from dxrvoxelizer_tpu.models.camera import OrbitCamera
from dxrvoxelizer_tpu.utils.config import VoxelizerConfig
from dxrvoxelizer_tpu.utils.objloader import ObjMesh
from dxrvoxelizer_tpu.models.scene import Scene
from tests.meshes import tetrahedron_mesh


def _tet_engine(**cfg_kw):
    v, nrm, t = tetrahedron_mesh()
    mesh = ObjMesh(
        positions=np.asarray(v, np.float32),
        normals=np.asarray(nrm, np.float32),
        indices=np.asarray(t, np.int32).reshape(-1),
        aabb_min=np.asarray(v, np.float32).min(axis=0),
        aabb_max=np.asarray(v, np.float32).max(axis=0),
    )
    cfg = VoxelizerConfig(grid_size=32, width=64, height=64, **cfg_kw)
    return Engine(cfg, scene=Scene(mesh), vox_impl="xla",
                  render_impl="gather")


class _KeyFeed:
    """Scripted key source standing in for the TTY."""

    def __init__(self, keys):
        self.keys = list(keys)
        self.enabled = True

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        pass

    def poll_key(self):
        return self.keys.pop(0) if self.keys else None


def test_headless_loop_renders_frames():
    eng = _tet_engine()
    n = interactive.run_interactive(eng, OrbitCamera(64, 64), max_frames=3)
    assert n == 3


def test_hotkeys_pause_switch_quit(monkeypatch, capsys):
    eng = _tet_engine()
    # pause, resume, switch the full pipeline, render a frame on the
    # alternate path, switch back, then quit
    feed = _KeyFeed([" ", " ", "x", None, "x", None, "q"])
    monkeypatch.setattr(interactive, "_RawTTY", lambda: feed)
    n = interactive.run_interactive(
        eng, OrbitCamera(64, 64), max_frames=10
    )
    out = capsys.readouterr().out
    assert "paused" in out and "resumed" in out
    assert "pipeline -> alt" in out and "pipeline -> primary" in out
    assert eng._pipeline_alt is not None  # alt pipeline actually rendered
    assert not eng.use_alt
    assert n < 10  # quit before exhausting frames


def test_engine_dual_pipeline_images_agree():
    """The two complete pipelines (primary vs oracle+gather alternate)
    render the same scene to an image tolerance — the reference's visual
    Core/EZ equivalence (DXRVoxelizer.cpp:295-297,420-481)."""
    from dxrvoxelizer_tpu.ez import Engine
    from dxrvoxelizer_tpu.models.scene import Scene
    from tests.meshes import icosphere_mesh

    v, nrm, t = icosphere_mesh(2, radius=0.6)
    world = np.asarray(v, np.float32) * 2.0 + np.array([0, 4, 0], np.float32)
    mesh = ObjMesh(
        positions=world, normals=np.asarray(nrm, np.float32),
        indices=np.asarray(t, np.int32).reshape(-1),
        aabb_min=world.min(axis=0), aabb_max=world.max(axis=0),
    )
    cfg = VoxelizerConfig(grid_size=32, width=64, height=64)
    eng = Engine(cfg, scene=Scene(mesh), vox_impl="xla", render_impl="warp")
    cam = OrbitCamera(64, 64)
    eng.update_frame(0, cam.eye, cam.view_proj)
    img_primary = np.asarray(eng.render(0))
    assert eng.toggle_path()
    img_alt = np.asarray(eng.render(0))
    eng.sync()
    diff = np.abs(img_primary - img_alt)
    assert diff.mean() < 0.03, diff.mean()
    assert np.percentile(diff, 99) < 0.35


def test_screenshot_key(monkeypatch, tmp_path):
    eng = _tet_engine()
    feed = _KeyFeed(["s"])
    monkeypatch.setattr(interactive, "_RawTTY", lambda: feed)
    monkeypatch.chdir(tmp_path)
    interactive.run_interactive(eng, OrbitCamera(64, 64), max_frames=2)
    assert list(tmp_path.glob("*.png"))


def test_hotkeys_orbit_zoom(monkeypatch, capsys):
    """hjkl orbit + o auto-orbit toggle move/steady the camera."""
    eng = _tet_engine()
    cam = OrbitCamera(64, 64)
    eye0 = cam.eye.copy()
    feed = _KeyFeed(["o", "h", "j", "+", None, "q"])
    monkeypatch.setattr(interactive, "_RawTTY", lambda: feed)
    interactive.run_interactive(eng, cam, max_frames=10)
    out = capsys.readouterr().out
    assert "auto-orbit off" in out
    # the manual orbit + zoom moved the eye
    assert not np.allclose(cam.eye, eye0)
    # focus distance shrank (zoom in)
    assert np.linalg.norm(cam.eye - cam.focus) < np.linalg.norm(
        eye0 - cam.focus
    )
