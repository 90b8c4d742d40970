"""Live-preview HTTP server tests (the swap-chain Present analog)."""

import threading
import urllib.request

import numpy as np

from dxrvoxelizer_tpu.app.preview import PreviewServer
from dxrvoxelizer_tpu.utils.image import encode_png, read_png


def test_encode_png_roundtrip(tmp_path):
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    p.write_bytes(encode_png(img))
    np.testing.assert_array_equal(read_png(p), img)


def test_preview_serves_published_frame(tmp_path):
    srv = PreviewServer(port=0)
    try:
        # index page is served
        page = urllib.request.urlopen(srv.url, timeout=5).read()
        assert b"frame.png" in page

        img = np.zeros((8, 16, 3), np.uint8)
        img[2, 3] = (255, 128, 1)
        srv.publish(img)
        r = urllib.request.urlopen(srv.url + "frame.png?after=-1", timeout=5)
        assert r.status == 200
        seq = int(r.headers["X-Frame-Seq"])
        assert seq == 1
        p = tmp_path / "got.png"
        p.write_bytes(r.read())
        np.testing.assert_array_equal(read_png(p), img)
    finally:
        srv.close()


def test_preview_long_poll_wakes_on_publish():
    srv = PreviewServer(port=0)
    try:
        srv.publish(np.zeros((4, 4, 3), np.uint8))
        got = {}

        def fetch():
            # ask for a frame NEWER than seq 1 -> blocks until publish #2
            r = urllib.request.urlopen(
                srv.url + "frame.png?after=1", timeout=10
            )
            got["seq"] = int(r.headers["X-Frame-Seq"])

        t = threading.Thread(target=fetch)
        t.start()
        # the render loop sees the waiter and publishes
        deadline = 50
        while not srv.wants_frame() and deadline:
            deadline -= 1
            import time

            time.sleep(0.02)
        assert srv.wants_frame()
        srv.publish(np.ones((4, 4, 3), np.uint8))
        t.join(timeout=10)
        assert got.get("seq") == 2
    finally:
        srv.close()


def _post_json(url, obj):
    import json

    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST",
    )
    return urllib.request.urlopen(req, timeout=5)


def test_preview_input_route_drains_to_camera():
    """POST /input events queue and drain into the orbit camera — the
    reference's WM_MOUSEMOVE/WM_MOUSEWHEEL path (DXRVoxelizer.cpp:301-356)
    through the browser page."""
    from dxrvoxelizer_tpu.models.camera import OrbitCamera

    srv = PreviewServer(port=0)
    try:
        r = _post_json(srv.url + "input", {"dx": 24.0, "dy": -8.0})
        assert r.status == 204
        r = _post_json(srv.url + "input", [{"wheel": 2.0}])  # list form too
        assert r.status == 204

        cam = OrbitCamera(640, 360)
        eye0 = np.asarray(cam.eye).copy()
        dist0 = float(np.linalg.norm(np.asarray(cam.eye)))
        assert srv.apply_camera_inputs(cam)
        assert not np.allclose(np.asarray(cam.eye), eye0)  # drag orbited
        assert float(np.linalg.norm(np.asarray(cam.eye))) < dist0  # zoomed in
        assert srv.poll_inputs() == []  # drained
    finally:
        srv.close()


def test_preview_input_route_rejects_garbage():
    srv = PreviewServer(port=0)
    try:
        import urllib.error

        req = urllib.request.Request(
            srv.url + "input", data=b"not json", method="POST"
        )
        try:
            urllib.request.urlopen(req, timeout=5)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # and the page wires the input handlers
        page = urllib.request.urlopen(srv.url, timeout=5).read()
        assert b"/input" in page and b"pointermove" in page
    finally:
        srv.close()


def test_preview_float_frame_and_stats():
    srv = PreviewServer(port=0)
    try:
        srv.publish(np.full((4, 4, 3), 0.5, np.float32))  # float [0,1] ok
        r = urllib.request.urlopen(srv.url + "stats.json", timeout=5)
        import json

        assert json.loads(r.read())["seq"] == 1
    finally:
        srv.close()
