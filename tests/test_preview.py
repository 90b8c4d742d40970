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


def test_preview_float_frame_and_stats():
    srv = PreviewServer(port=0)
    try:
        srv.publish(np.full((4, 4, 3), 0.5, np.float32))  # float [0,1] ok
        r = urllib.request.urlopen(srv.url + "stats.json", timeout=5)
        import json

        assert json.loads(r.read())["seq"] == 1
    finally:
        srv.close()
