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

import numpy as np
import pytest

from tests.zoo import build_zoo, portrait_landmarks

pytestmark = pytest.mark.e2e


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
    # style 'arcane1-d' → id 0 (tests/zoo.py holds the layout)
    return build_zoo(tmp_path_factory.mktemp("serve_zoo"),
                     "vtoonify_d_arcane", torch_seed=33, bank_seed=34)


def test_serve_endpoints(zoo_root, tmp_path):
    import cv2

    from vtoonify_tpu.pipeline.model_api import Model

    serve = _load_serve()

    # synthetic 500x375 portrait + plausible landmarks (StaticLandmarker)
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (375, 500, 3), np.uint8)
    model = Model(checkpoint_root=str(zoo_root),
                  landmarks=portrait_landmarks())
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
        # non-numeric degree → 400, not a dropped connection
        conn.request(
            "POST", "/toonify?style_type=arcane1-d&style_degree=abc",
            body=enc.tobytes())
        r = conn.getresponse()
        r.read()
        assert r.status == 400
        # registry style whose checkpoints aren't installed → 404
        conn.request("POST", "/toonify?style_type=cartoon1",
                     body=enc.tobytes())
        r = conn.getresponse()
        r.read()
        assert r.status == 404
    finally:
        server.shutdown()


def test_model_detect_and_align_video(zoo_root, tmp_path):
    """Model.detect_and_align_video (reference vtoonify_model.py:156):
    first-frame alignment for style-code extraction, plus the reference's
    empty-file / unreadable-video error messages."""
    import cv2

    from vtoonify_tpu.pipeline.model_api import Model

    model = Model(checkpoint_root=str(zoo_root),
                  landmarks=portrait_landmarks())

    _, _, msg = model.detect_and_align_video(None)
    assert msg == "Error: fail to load empty file."
    _, _, msg = model.detect_and_align_video(str(tmp_path / "missing.mp4"))
    assert msg == "Error: fail to load the video."

    rng = np.random.RandomState(11)
    frames = rng.randint(0, 256, (3, 375, 500, 3), np.uint8)
    vid = str(tmp_path / "clip.mp4")
    w = cv2.VideoWriter(vid, cv2.VideoWriter_fourcc(*"mp4v"), 10, (500, 375))
    assert w.isOpened()
    for f in frames:
        w.write(cv2.cvtColor(f, cv2.COLOR_RGB2BGR))
    w.release()

    frame, aligned, msg = model.detect_and_align_video(vid)
    assert msg == "Success"
    # identical to aligning the (codec-decoded) first frame directly
    cap = cv2.VideoCapture(vid)
    ok, first_bgr = cap.read()
    cap.release()
    assert ok
    f2, a2, m2 = model.detect_and_align_frame(
        cv2.cvtColor(first_bgr, cv2.COLOR_BGR2RGB))
    assert m2 == "Success"
    np.testing.assert_array_equal(frame, f2)
    np.testing.assert_array_equal(aligned, a2)
