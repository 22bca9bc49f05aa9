"""Stdlib HTTP front-end for the batched inference engine.

Endpoints (JSON in, PNG or JSON out):

  POST /generate   {"prompt": str?, "seed": int?, "class_id": int?,
                    "guidance": float?, "mask": nested list (H,W,C)?,
                    "response": "png" (default) | "json"}
                   -> image/png bytes, or {"image_b64": ..., "shape": [...]}
  GET  /healthz    -> engine config + provenance stamp (the same stamp every
                      artifact in this repo carries — substituted components
                      are visible to the client, not hidden behind the API)
  GET  /stats      -> batcher counters (requests, batches, mean batch size)

Concurrency model: ``ThreadingHTTPServer`` gives one thread per connection;
all of them funnel into the single ``RequestBatcher`` queue, which is what
actually forms TPU batches — HTTP concurrency becomes device batching
instead of device contention. Python threads are fine here: the work is
IO + one jitted call that releases the GIL.

This replaces the reference's tkinter GUI scripts for production use
(SURVEY.md §2.6; /root/reference/GUI_image_generator.py and 7 siblings);
the repo's gui/mask_painter.py remains the interactive analogue.
"""

from __future__ import annotations

import base64
import io
import json
import logging
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from stablediffusion_pytorch_tpu.serving.engine import (
    GenerateRequest, InferenceEngine, RequestBatcher,
)

log = logging.getLogger("sdtpu")

MAX_BODY = 64 * 1024 * 1024  # 512^2 float masks fit; reject absurd bodies


def _png_bytes(img: np.ndarray) -> bytes:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(img).save(buf, format="PNG")
    return buf.getvalue()


class _Handler(BaseHTTPRequestHandler):
    # the server instance carries .batcher / .engine (see make_server)
    def _send(self, code: int, body: bytes, ctype: str):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def _send_json(self, code: int, obj: dict):
        self._send(code, json.dumps(obj).encode(), "application/json")

    def log_message(self, fmt, *args):  # route through the repo logger
        log.debug("serve: " + fmt, *args)

    def do_GET(self):  # noqa: N802 (http.server API)
        if self.path == "/healthz":
            self._send_json(200, {"status": "ok",
                                  **self.server.engine.info()})
        elif self.path == "/stats":
            self._send_json(200, self.server.batcher.stats())
        else:
            self._send_json(404, {"error": f"no route {self.path}"})

    def do_POST(self):  # noqa: N802
        if self.path != "/generate":
            self._send_json(404, {"error": f"no route {self.path}"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            if length > MAX_BODY:
                self._send_json(413, {"error": "body too large"})
                return
            payload = json.loads(self.rfile.read(length) or b"{}")
            mask = payload.get("mask")
            req = GenerateRequest(
                prompt=str(payload.get("prompt", "")),
                seed=int(payload.get("seed", 0)),
                class_id=(None if payload.get("class_id") is None
                          else int(payload["class_id"])),
                guidance=(None if payload.get("guidance") is None
                          else float(payload["guidance"])),
                mask=(None if mask is None
                      else np.asarray(mask, np.float32)),
            )
        except (ValueError, TypeError, json.JSONDecodeError) as e:
            self._send_json(400, {"error": f"bad request: {e}"})
            return
        try:
            img = self.server.batcher.submit(req).result(
                timeout=self.server.request_timeout_s)
        except Exception as e:  # noqa: BLE001 — surface engine errors
            self._send_json(500, {"error": str(e)})
            return
        if payload.get("response") == "json":
            self._send_json(200, {
                "image_b64": base64.b64encode(_png_bytes(img)).decode(),
                "shape": list(img.shape), "seed": req.seed,
            })
        else:
            self._send(200, _png_bytes(img), "image/png")


def make_server(engine: InferenceEngine, host: str = "127.0.0.1",
                port: int = 8000, *, window_s: float = 0.05,
                request_timeout_s: float = 600.0) -> ThreadingHTTPServer:
    """Build (but don't start) the HTTP server; ``.serve_forever()`` to run.

    Port 0 picks a free port (``server.server_address[1]`` to read it back —
    used by tests). ``server.batcher.close()`` on shutdown."""
    srv = ThreadingHTTPServer((host, port), _Handler)
    srv.engine = engine
    if hasattr(engine, "_tick_once"):
        # SlotEngine (serving/continuous.py) schedules itself: its
        # submit/stats/close triple is batcher-compatible, and its
        # background scheduler thread replaces the coalescing worker
        engine.start()
        srv.batcher = engine
    else:
        srv.batcher = RequestBatcher(engine, window_s=window_s)
    srv.request_timeout_s = request_timeout_s
    return srv
