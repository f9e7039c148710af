"""Smoke test for examples/serve.py — the demo app shell over the Model API
(reference vtoonify_model.py as mounted by its HF Space). Builds the
reference-format synthetic checkpoint zoo in the Model's expected directory
layout, starts the stdlib server on an ephemeral port, and drives the three
endpoints over real HTTP."""

import http.client
import importlib.util
import json
import os
import sys
from argparse import Namespace

import numpy as np
import pytest
import torch

from tests import reference_oracle as oracle

oracle.install()
from model.vtoonify import VToonify  # noqa: E402
from model.bisenet.model import BiSeNet  # noqa: E402
from model.encoder.encoders.psp_encoders import GradualStyleEncoder  # noqa: E402

pytestmark = pytest.mark.e2e

N_LATENT = 12


def _load_serve():
    path = os.path.join(os.path.dirname(__file__), "..", "examples",
                        "serve.py")
    spec = importlib.util.spec_from_file_location("serve_demo", path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules["serve_demo"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def zoo_root(tmp_path_factory):
    """checkpoint_root in the exact layout Model expects
    (reference checkpoint/README.md:4-35): faceparsing.pth + encoder.pt at
    the root, style checkpoints + exstyle bank per style directory."""
    root = tmp_path_factory.mktemp("serve_zoo")
    torch.manual_seed(33)
    style_dir = root / "vtoonify_d_arcane"  # style 'arcane1-d' → id 0
    style_dir.mkdir()
    vt = VToonify(in_size=32, out_size=128, channel_multiplier=1,
                  num_res_layers=2, backbone="dualstylegan")
    torch.save({"g_ema": vt.state_dict()}, str(style_dir / "vtoonify_s_d.pt"))
    torch.save(BiSeNet(19).state_dict(), str(root / "faceparsing.pth"))
    enc = GradualStyleEncoder(50, "ir_se",
                              Namespace(input_nc=3, n_styles=N_LATENT))
    torch.save(
        {
            "state_dict": {"encoder." + k: v
                           for k, v in enc.state_dict().items()},
            "latent_avg": torch.randn(N_LATENT, 512),
        },
        str(root / "encoder.pt"),
    )
    rng = np.random.RandomState(34)
    bank = {"style0.png": rng.randn(1, N_LATENT, 512).astype(np.float32) * 0.3}
    np.save(str(style_dir / "exstyle_code.npy"), bank, allow_pickle=True)
    return root


def test_serve_endpoints(zoo_root, tmp_path):
    import cv2

    from vtoonify_tpu.pipeline.model_api import Model

    serve = _load_serve()

    # synthetic 500x375 portrait + plausible landmarks (StaticLandmarker)
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (375, 500, 3), np.uint8)
    lm = np.zeros((68, 2), np.float32)
    lm[36:42] = [190, 150]
    lm[42:48] = [300, 150]
    lm[27:36] = [245, 200]
    lm[48:68] = [245, 260]

    model = Model(checkpoint_root=str(zoo_root), landmarks=lm)
    server = serve.build_server(model, "127.0.0.1", 0,
                                default_style="arcane1-d")
    serve.serve_forever_in_thread(server)
    port = server.server_address[1]
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=600)

        conn.request("GET", "/")
        r = conn.getresponse()
        page = r.read().decode()
        assert r.status == 200 and "arcane1-d" in page

        conn.request("GET", "/styles")
        r = conn.getresponse()
        styles = json.loads(r.read())
        assert r.status == 200 and "cartoon1" in styles

        ok, enc = cv2.imencode(".png", cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        assert ok
        conn.request(
            "POST",
            "/toonify?style_type=arcane1-d&style_degree=0.5",
            body=enc.tobytes(),
        )
        r = conn.getresponse()
        body = r.read()
        assert r.status == 200, body.decode(errors="replace")
        out = cv2.imdecode(np.frombuffer(body, np.uint8), cv2.IMREAD_COLOR)
        assert out is not None
        # 4× the cropped input, both dims multiples of 8×4
        assert out.shape[0] % 32 == 0 and out.shape[1] % 32 == 0
        assert out.shape[0] >= 4 * 64

        # error paths: bad style, empty body
        conn.request("POST", "/toonify?style_type=nope", body=b"x")
        r = conn.getresponse()
        r.read()
        assert r.status == 400
        conn.request("POST", "/toonify?style_type=arcane1-d", body=b"")
        r = conn.getresponse()
        r.read()
        assert r.status == 400
    finally:
        server.shutdown()
