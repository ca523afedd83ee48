"""Minimal production serving surface: text -> panorama over HTTP.

The reference ships only batch scripts; a deployable framework needs a
serving path. This is deliberately dependency-free (stdlib http.server):
the model + params load once, the sampling program compiles once at
startup (`warm`), and requests serialize through a lock — one chip runs
one CFG dual-branch sample at a time, which IS the v5e's optimal operating
point (BASELINE.md round 1: batched prompts LOWER panos/min; the effective
view batch already saturates the MXU at b=1).

Endpoints:
  GET  /healthz            {"status": "ok", "warm": true, ...}
  GET  /                   tiny HTML form
  POST /generate           {"prompt": str, "seed"?: int} -> image/jpeg
                           (?format=json -> base64 + timing metadata)

Run: python -m panfusion_tpu.cli serve --port 8321 \
         --ckpt_path logs/synpano_diff/checkpoints/last \
         --model.preset=demo ...
"""
from __future__ import annotations

import base64
import io
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Optional

_FORM = b"""<!doctype html><title>panfusion-tpu</title>
<h3>panfusion-tpu: text &rarr; 360&deg; panorama</h3>
<form method=post action=/generate>
<input name=prompt size=60 placeholder="a cozy living room">
<button>generate</button></form>"""


class PanoService:
    """Owns the model, params, and the serialized inference path."""

    def __init__(self, model, params, seed: int = 0):
        self.model = model
        self.params = params
        self.seed = seed
        self.lock = threading.Lock()
        self.warm = False
        self.n_served = 0
        self.last_latency_s: Optional[float] = None

    def warmup(self):
        import jax

        t0 = time.time()
        self.generate_pano("warmup", seed=0)
        self.warm = True
        print(f"serve: warm in {time.time() - t0:.1f}s "
              f"(backend={jax.default_backend()})")

    def generate_pano(self, prompt: str, seed: Optional[int] = None):
        import jax

        batch = {"pano_prompt": [prompt], "prompt": None}
        rng = jax.random.PRNGKey(self.seed if seed is None else seed)
        with self.lock:
            t0 = time.time()
            _, pano = self.model.inference(self.params, batch, rng)
            self.last_latency_s = time.time() - t0
            self.n_served += 1
        return pano[0]


def _make_handler(svc: PanoService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet access log -> stdout
            print(f"serve: {self.address_string()} {fmt % args}")

        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/healthz"):
                body = json.dumps({
                    "status": "ok", "warm": svc.warm,
                    "served": svc.n_served,
                    "last_latency_s": svc.last_latency_s,
                }).encode()
                return self._send(200, body, "application/json")
            return self._send(200, _FORM, "text/html")

        def do_POST(self):
            if not self.path.startswith("/generate"):
                return self._send(404, b"not found", "text/plain")
            n = int(self.headers.get("Content-Length", 0))
            raw = self.rfile.read(n)
            ctype = self.headers.get("Content-Type", "")
            try:
                if "json" in ctype:
                    req = json.loads(raw or b"{}")
                else:  # HTML form
                    from urllib.parse import parse_qs

                    q = parse_qs(raw.decode())
                    req = {"prompt": q.get("prompt", [""])[0]}
            except (ValueError, UnicodeDecodeError) as e:
                return self._send(400, f"bad request: {e}".encode(),
                                  "text/plain")
            prompt = (req.get("prompt") or "").strip()
            if not prompt:
                return self._send(400, b"missing 'prompt'", "text/plain")
            seed = req.get("seed")
            t0 = time.time()
            pano = svc.generate_pano(prompt, seed)
            from PIL import Image

            buf = io.BytesIO()
            Image.fromarray(pano).save(buf, format="JPEG", quality=92)
            if "format=json" in self.path:
                body = json.dumps({
                    "prompt": prompt,
                    "jpeg_base64": base64.b64encode(buf.getvalue()).decode(),
                    "latency_s": round(time.time() - t0, 3),
                    "height": int(pano.shape[0]), "width": int(pano.shape[1]),
                }).encode()
                return self._send(200, body, "application/json")
            return self._send(200, buf.getvalue(), "image/jpeg")

    return Handler


def serve(model, params, host: str = "127.0.0.1", port: int = 8321,
          seed: int = 0, warmup: bool = True) -> ThreadingHTTPServer:
    """Build + warm the service and return a ready (unstarted) HTTP server.
    Callers run `srv.serve_forever()` (the CLI does) or drive it from a
    thread (tests do)."""
    svc = PanoService(model, params, seed=seed)
    if warmup:
        svc.warmup()
    srv = ThreadingHTTPServer((host, port), _make_handler(svc))
    srv.service = svc  # for tests/introspection
    print(f"serve: listening on http://{host}:{port}")
    return srv
