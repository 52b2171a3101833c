"""Browser-based image viewer for headless servers (webcv2 analog).

The reference ships ``concern/webcv2`` — a small web server streaming cv2
windows to a browser (SURVEY.md §2.1). This is the same capability with
stdlib only: ``imshow(name, image)`` collects images; ``serve()`` starts an
HTTP server with an auto-refreshing gallery; ``waitKey()`` blocks like the
cv2 API shape expects.
"""

from __future__ import annotations

import html

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Dict, Optional, Tuple

import numpy as np

_images: Dict[str, bytes] = {}
_lock = threading.Lock()
_server: Optional[ThreadingHTTPServer] = None


def _encode_png(image: np.ndarray) -> bytes:
    import cv2

    img = np.ascontiguousarray(image)
    if img.ndim == 3 and img.shape[2] == 3:
        img = cv2.cvtColor(img.astype(np.uint8), cv2.COLOR_RGB2BGR)
    ok, buf = cv2.imencode(".png", img)
    if not ok:
        raise ValueError("png encode failed")
    return bytes(buf)


def imshow(name: str, image: np.ndarray) -> None:
    with _lock:
        _images[name] = _encode_png(image)


class _Handler(BaseHTTPRequestHandler):
    def log_message(self, *a):  # quiet
        pass

    def do_GET(self):
        if self.path.startswith("/img/"):
            name = self.path[len("/img/"):]
            with _lock:
                data = _images.get(name)
            if data is None:
                self.send_response(404)
                self.end_headers()
                return
            self.send_response(200)
            self.send_header("Content-Type", "image/png")
            self.end_headers()
            self.wfile.write(data)
            return
        with _lock:
            names = list(_images)
        body = "<html><head><meta http-equiv='refresh' content='2'></head><body>"
        for n in names:
            safe = html.escape(n)
            body += f"<div><h3>{safe}</h3><img src='/img/{safe}'/></div>"
        body += "</body></html>"
        data = body.encode()
        self.send_response(200)
        self.send_header("Content-Type", "text/html")
        self.end_headers()
        self.wfile.write(data)


def serve(port: int = 8087) -> int:
    """Start (once) the gallery server in a daemon thread; returns port."""
    global _server
    if _server is not None:
        return _server.server_address[1]
    _server = ThreadingHTTPServer(("0.0.0.0", port), _Handler)
    threading.Thread(target=_server.serve_forever, daemon=True).start()
    return port


def waitKey(ms: int = 0) -> int:
    import time

    time.sleep(max(ms, 1) / 1000.0)
    return -1
