"""Live preview surface: a local HTTP viewer for the progressive loop.

TPU re-design of the reference's OpenGL preview window (reference
``src/glium_window.rs:18-231``): the reference runs a render worker thread
that exchanges the frame buffer with a UI thread over channels and uploads
it to a GL texture. Here the "display" is the browser and the "channel" is
an HTTP endpoint — the render loop pushes each accumulated frame into the
server (device->host copy + PNG encode overlap the *next* frame's device
work, the same 2-stage pipeline as ``glium_window.rs:81-135``), and the page
refreshes itself.

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
        self._stats = {"frame": 0, "mrays_per_s": 0.0, "width": 0, "height": 0}
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API name)
                path = self.path.split("?")[0]
                if path == "/" or path == "/index.html":
                    body, ctype = _PAGE, "text/html"
                elif path == "/frame.png":
                    with outer._lock:
                        body = outer._png
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
        """Push a new accumulated frame (linear [H, W, 3], device or host).

        Encodes at a fast zlib level — the encode overlaps the next frame's
        device computation (JAX async dispatch), mirroring the reference's
        render/display pipeline overlap.
        """
        arr = np.asarray(img_linear)
        png = film.encode_png(film.to_srgb_u8(arr[::-1]), compress_level=1)
        with self._lock:
            self._png = png
            self._stats = {
                "frame": int(frame),
                "mrays_per_s": float(mrays_per_s),
                "width": int(arr.shape[1]),
                "height": int(arr.shape[0]),
            }

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
