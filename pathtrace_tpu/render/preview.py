"""Live preview surface: a local HTTP viewer for the progressive loop.

TPU re-design of the reference's OpenGL preview window (reference
``src/glium_window.rs:18-231``): the reference runs a render worker thread
that exchanges the frame buffer with a UI thread over channels and uploads
it to a GL texture. Here the "display" is the browser and the "channel" is
an HTTP endpoint — the render loop publishes each accumulated frame's
array REFERENCE (cheap); the device->host copy + PNG encode run lazily in
the HTTP handler thread when the page actually fetches ``/frame.png``
(the same worker/display split as ``glium_window.rs:81-135``), and the
page refreshes itself.

Endpoints:
  /            viewer page (auto-refreshing <img> + stats line)
  /frame.png   latest accumulated frame as PNG
  /stats.json  frame counter / Mrays/s / image size

Zero dependencies: stdlib ``http.server`` on a daemon thread.
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from pathtrace_tpu.render import film

_PAGE = b"""<!doctype html>
<html><head><title>pathtrace_tpu</title><style>
  body { background: #111; color: #ddd; font-family: monospace; text-align: center; }
  img  { image-rendering: pixelated; max-width: 95vw; max-height: 85vh;
         border: 1px solid #444; margin-top: 1em; }
</style></head><body>
<div id="stats">waiting for first frame...</div>
<img id="frame" src="/frame.png">
<script>
  const img = document.getElementById('frame');
  const stats = document.getElementById('stats');
  async function tick() {
    try {
      const r = await fetch('/stats.json');
      const s = await r.json();
      stats.textContent = `frame ${s.frame}  ${s.mrays_per_s.toFixed(2)} Mrays/s  ${s.width}x${s.height}`;
      img.src = '/frame.png?f=' + s.frame;
    } catch (e) {}
    setTimeout(tick, 500);
  }
  tick();
</script></body></html>"""


class PreviewServer:
    """Serves the latest accumulated frame; updated from the render loop."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0):
        self._lock = threading.Lock()
        self._png: bytes = film.encode_png(np.zeros((2, 2, 3), np.uint8))
        self._png_frame = -1
        self._latest = None  # device (or host) array, published by update()
        self._stats = {"frame": 0, "mrays_per_s": 0.0, "width": 0, "height": 0}
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API name)
                path = self.path.split("?")[0]
                if path == "/" or path == "/index.html":
                    body, ctype = _PAGE, "text/html"
                elif path == "/frame.png":
                    body = outer._frame_png()
                    ctype = "image/png"
                elif path == "/stats.json":
                    with outer._lock:
                        body = json.dumps(outer._stats).encode()
                    ctype = "application/json"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *args):  # silence per-request stderr spam
                pass

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self._thread = threading.Thread(
            target=self._httpd.serve_forever, daemon=True
        )
        self._thread.start()

    @property
    def url(self) -> str:
        host, port = self._httpd.server_address[:2]
        return f"http://{host}:{port}/"

    def update(self, img_linear, frame: int, mrays_per_s: float = 0.0) -> None:
        """Publish a new accumulated frame (linear [H, W, 3], device or host).

        Cheap on the render loop's critical path: only the array REFERENCE
        is published here; the device->host readback and PNG encode happen
        lazily in the HTTP handler thread when ``/frame.png`` is actually
        fetched (and are cached per frame). Un-viewed frames cost the
        render loop nothing — the worker/display split of the reference's
        two-thread pipeline (``glium_window.rs:81-135``).
        """
        with self._lock:
            self._latest = img_linear
            self._stats = {
                "frame": int(frame),
                "mrays_per_s": float(mrays_per_s),
                "width": int(img_linear.shape[1]),
                "height": int(img_linear.shape[0]),
            }

    def _frame_png(self) -> bytes:
        """Latest frame as PNG: lazy readback + encode, cached per frame."""
        with self._lock:
            latest = self._latest
            frame = self._stats["frame"]
            if latest is None or self._png_frame == frame:
                return self._png
        # readback + encode OUTSIDE the lock (slow; handler thread only)
        arr = np.asarray(latest)
        png = film.encode_png(film.to_srgb_u8(arr[::-1]), compress_level=1)
        with self._lock:
            if frame >= self._png_frame:
                self._png = png
                self._png_frame = frame
        return png

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
