"""Live frame preview over HTTP — the swap-chain Present analog.

The reference presents every frame to a Win32 window (the WM_PAINT loop,
Win32Application.cpp:205-211, drives SwapChain::Present,
DXRVoxelizer.cpp:267). A headless TPU host has no display, so the analog is
a localhost endpoint any browser can watch: a stdlib ThreadingHTTPServer
serves an HTML page whose ``<img>`` re-fetches ``/frame.png`` as fast as
frames arrive (self-paced: the next fetch starts when the previous one
decodes, long-polling on the frame sequence number so an idle scene costs
nothing).

Zero dependencies: PNG via utils/image.encode_png (stdlib zlib). The render
loop stays decoupled — :meth:`PreviewServer.publish` stores a reference to
the latest frame under a lock; encoding happens in the HTTP worker thread,
and the loop can consult :meth:`wants_frame` to skip the device->host copy
entirely while nobody is watching.
"""

from __future__ import annotations

import json
import socket
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

_PAGE = """<!doctype html>
<html><head><title>dxrvoxelizer_tpu live preview</title>
<style>
 body { background: #111; color: #ccc; font: 13px monospace;
        display: flex; flex-direction: column; align-items: center; }
 img { image-rendering: pixelated; margin-top: 12px;
       border: 1px solid #333; }
</style></head>
<body>
<div id="s">connecting&#8230;</div>
<img id="v" alt="frame">
<script>
const v = document.getElementById('v'), s = document.getElementById('s');
let seq = -1, shown = 0, t0 = performance.now();
async function loop() {
  for (;;) {
    try {
      // long-poll: the server replies when a frame newer than seq exists
      const r = await fetch('/frame.png?after=' + seq);
      if (r.status === 200) {
        seq = parseInt(r.headers.get('X-Frame-Seq') || '-1');
        const blob = await r.blob();
        const url = URL.createObjectURL(blob);
        await new Promise((res) => { v.onload = res; v.src = url; });
        URL.revokeObjectURL(url);
        shown++;
        const dt = (performance.now() - t0) / 1000;
        if (dt > 0.5) {
          s.textContent = 'frame ' + seq + ' \\u00b7 ' +
                          (shown / dt).toFixed(1) + ' fps shown';
          shown = 0; t0 = performance.now();
        }
      }
    } catch (e) { s.textContent = 'disconnected'; return; }
  }
}
loop();
</script>
</body></html>
"""


class PreviewServer:
    """Publish frames; serve them at ``http://host:port/``.

    ``publish(img)`` accepts [H,W,3] float [0,1] or uint8 arrays (numpy or
    device). ``wants_frame()`` is True when a client is long-polling for a
    frame newer than the published one — the render loop can use it to
    skip publishes while nobody watches.
    """

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._lock = threading.Condition()
        self._frame: np.ndarray | None = None
        self._seq = 0
        self._waiters = 0
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def do_GET(self):
                if self.path.startswith("/frame.png"):
                    after = -1
                    if "after=" in self.path:
                        try:
                            after = int(self.path.split("after=")[1]
                                        .split("&")[0])
                        except ValueError:
                            pass
                    frame, seq = server._wait_frame(after)
                    if frame is None:
                        self.send_response(204)  # no frame yet / timeout
                        self.end_headers()
                        return
                    from dxrvoxelizer_tpu.utils.image import encode_png

                    png = encode_png(frame, level=1)
                    self.send_response(200)
                    self.send_header("Content-Type", "image/png")
                    self.send_header("Content-Length", str(len(png)))
                    self.send_header("X-Frame-Seq", str(seq))
                    self.send_header("Cache-Control", "no-store")
                    self.end_headers()
                    self.wfile.write(png)
                elif self.path.startswith("/stats.json"):
                    body = json.dumps({"seq": server._seq}).encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "application/json")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                elif self.path == "/":
                    body = _PAGE.encode()
                    self.send_response(200)
                    self.send_header("Content-Type",
                                     "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                else:
                    self.send_response(404)
                    self.end_headers()

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._httpd.daemon_threads = True
        self.host, self.port = self._httpd.server_address[:2]
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, name="preview-http",
            daemon=True,
        )
        self._thread.start()

    @property
    def url(self) -> str:
        return f"http://{self.host}:{self.port}/"

    def publish(self, img) -> None:
        """Store the latest frame (device arrays are copied to host here)."""
        host_img = np.asarray(img)
        with self._lock:
            self._frame = host_img
            self._seq += 1
            self._lock.notify_all()

    def wants_frame(self) -> bool:
        """True when a client is waiting for a newer frame than published."""
        with self._lock:
            return self._waiters > 0

    def _wait_frame(self, after: int, timeout: float = 10.0):
        """Block until a frame with seq > after exists (long poll)."""
        deadline = time.monotonic() + timeout
        with self._lock:
            self._waiters += 1
            try:
                while self._seq <= after or self._frame is None:
                    left = deadline - time.monotonic()
                    if left <= 0:
                        return None, self._seq
                    self._lock.wait(left)
                return self._frame, self._seq
            finally:
                self._waiters -= 1

    def close(self) -> None:
        with self._lock:
            self._lock.notify_all()
        self._httpd.shutdown()
        self._httpd.server_close()


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]
