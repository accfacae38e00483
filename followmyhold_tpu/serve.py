"""HTTP serving entry point.

The reference's LangSAM ships a LitServe HTTP server (third_party/LSAM/
lang_sam/server.py:14-50, unused by the batch pipeline). This is the
framework's serving analogue, stdlib-only: a threaded HTTP server exposing

  POST /segment      {image: b64 png, prompt: str} -> {mask: b64 png}
  POST /reconstruct  {image: b64 png}              -> {obj_ply: b64, hand_ply: b64}
  GET  /healthz

Models load once at startup (the whole point of serving vs. the reference's
reload-per-subprocess design); requests are served from the resident jitted
graphs.

    python -m followmyhold_tpu.serve --port 8080
"""

from __future__ import annotations

import argparse
import base64
import io
import json
import os
import tempfile
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np


class _State:
    bundle = None
    lock = threading.Lock()


def _segment(image_rgb: np.ndarray, prompt: str) -> np.ndarray:
    from followmyhold_tpu.preprocess.detectors import default_bundle

    with _State.lock:
        if _State.bundle is None:
            _State.bundle = default_bundle()
        return _State.bundle.segment(image_rgb, prompt)


def _reconstruct(image_rgb: np.ndarray) -> dict:
    """Run the full pipeline for one image in a temp workspace; return the
    exported meshes. (Stage resumability makes repeated calls cheap only for
    identical ids; each request gets a fresh workspace.)"""
    from PIL import Image

    from followmyhold_tpu.configs.pipeline import load_config
    from followmyhold_tpu.main import run_pipeline

    with tempfile.TemporaryDirectory() as td:
        img_path = os.path.join(td, "query.png")
        Image.fromarray(image_rgb).save(img_path)
        cfg_path = os.path.join(td, "pipeline.env")
        with open(cfg_path, "w", encoding="utf-8") as f:
            f.write(f"PROJECT_ROOT={td}\nBASE_DIR={td}/out\nIMAGE_PATH={img_path}\n")
        cfg = load_config(cfg_path)
        run_pipeline(cfg)
        out = {}
        for name, path in (("obj_ply", f"{cfg.guidance_out_path}/query_obj.ply"),
                           ("hand_ply", f"{cfg.guidance_out_path}/query_hand.ply")):
            if os.path.exists(path):
                with open(path, "rb") as f:
                    out[name] = base64.b64encode(f.read()).decode("ascii")
        return out


class Handler(BaseHTTPRequestHandler):
    def _json(self, code: int, payload: dict) -> None:
        body = json.dumps(payload).encode("utf-8")
        self.send_response(code)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        if self.path == "/healthz":
            self._json(200, {"status": "ok"})
        else:
            self._json(404, {"error": "unknown path"})

    def do_POST(self):  # noqa: N802
        from PIL import Image

        if self.path not in ("/segment", "/reconstruct"):
            self._json(404, {"error": "unknown path"})
            return
        try:
            length = int(self.headers.get("Content-Length", 0))
            req = json.loads(self.rfile.read(length))
            img = np.asarray(Image.open(
                io.BytesIO(base64.b64decode(req["image"]))).convert("RGB"))
            if self.path == "/segment":
                mask = _segment(img, req.get("prompt", "object"))
                buf = io.BytesIO()
                Image.fromarray((mask * 255).astype(np.uint8)).save(buf, "PNG")
                self._json(200, {"mask": base64.b64encode(buf.getvalue()).decode()})
            elif self.path == "/reconstruct":
                self._json(200, _reconstruct(img))
            else:
                self._json(404, {"error": "unknown path"})
        except Exception as e:  # noqa: BLE001
            self._json(500, {"error": str(e)})

    def log_message(self, fmt, *args):  # quiet
        pass


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--port", type=int, default=8080)
    parser.add_argument("--host", default="127.0.0.1")
    args = parser.parse_args()
    server = ThreadingHTTPServer((args.host, args.port), Handler)
    print(f"serving on http://{args.host}:{args.port}")
    server.serve_forever()


if __name__ == "__main__":
    main()
