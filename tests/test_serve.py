"""Serving surface (panfusion_tpu/serve.py): model loads once, requests
serialize through the service lock, and /generate returns a decodable
panorama over plain HTTP. Tiny preset at 64px / 2 DDIM steps keeps this in
the fast tier."""
import io
import json
import threading
import urllib.request

import numpy as np
import pytest


@pytest.fixture(scope="module")
def server():
    import jax

    from panfusion_tpu.models.panfusion import (PanFusion, PanFusionConfig,
                                                cast_params)
    from panfusion_tpu.serve import serve

    cfg = PanFusionConfig(preset="tiny", pano_height=64, pers_resolution=32,
                          num_views=2, diff_timestep=2, scan_chunk=0)
    model = PanFusion(cfg)
    params = cast_params(model.init_params(jax.random.PRNGKey(0)), cfg.dtype)
    srv = serve(model, params, port=0, warmup=False)  # port 0 = ephemeral
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv
    srv.shutdown()


def _url(srv, path):
    host, port = srv.server_address
    return f"http://{host}:{port}{path}"


def test_healthz(server):
    with urllib.request.urlopen(_url(server, "/healthz")) as r:
        body = json.loads(r.read())
    assert body["status"] == "ok"
    assert body["served"] == 0


def test_generate_jpeg_roundtrip(server):
    req = urllib.request.Request(
        _url(server, "/generate"),
        data=json.dumps({"prompt": "a cozy living room", "seed": 3}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        assert r.headers["Content-Type"] == "image/jpeg"
        from PIL import Image

        img = np.asarray(Image.open(io.BytesIO(r.read())))
    assert img.shape == (64, 128, 3)
    # health reflects the served request
    with urllib.request.urlopen(_url(server, "/healthz")) as r:
        h = json.loads(r.read())
    assert h["served"] == 1 and h["last_latency_s"] > 0


def test_generate_json_format(server):
    req = urllib.request.Request(
        _url(server, "/generate?format=json"),
        data=json.dumps({"prompt": "a red room"}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req) as r:
        body = json.loads(r.read())
    assert body["height"] == 64 and body["width"] == 128
    assert len(body["jpeg_base64"]) > 100


def test_missing_prompt_is_400(server):
    req = urllib.request.Request(
        _url(server, "/generate"), data=b"{}",
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req)
    assert e.value.code == 400
