"""Aux components: ArcFace/IDLoss, VGG19 loss, full pSp wrapper, full ADA
color augment, collectives, Model API registry."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests import reference_oracle as oracle

oracle.install()


def test_arcface_parity():
    from model.encoder.encoders.model_irse import Backbone

    from vtoonify_tpu.models.arcface import arcface_apply

    torch.manual_seed(100)
    ref = Backbone(input_size=112, num_layers=50, mode="ir_se").eval()
    sd = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    # convert via the pSp bottleneck converter + output head
    from vtoonify_tpu.convert.torch_import import (
        _conv,
        _linear,
        convert_batch_norm,
        convert_psp_encoder,
    )
    from vtoonify_tpu.models.psp_encoder import PSPEncoderConfig

    # reuse body/input conversion by mapping keys
    params = {
        "input_conv": _conv(sd, "input_layer.0"),
        "input_bn": convert_batch_norm(sd, "input_layer.1"),
        "input_prelu": {"weight": jnp.asarray(sd["input_layer.2.weight"])},
        "body": convert_psp_encoder(
            {**sd, "latlayer1.weight": sd["input_layer.0.weight"],
             "latlayer1.bias": np.zeros(1), "latlayer2.weight":
             sd["input_layer.0.weight"], "latlayer2.bias": np.zeros(1)},
            PSPEncoderConfig(n_styles=0),
        )["body"],
        "out_bn": convert_batch_norm(sd, "output_layer.0"),
        "out_linear": _linear(sd, "output_layer.3"),
        "out_bn1d": {
            "running_mean": jnp.asarray(sd["output_layer.4.running_mean"]),
            "running_var": jnp.asarray(sd["output_layer.4.running_var"]),
        },
    }
    x = np.random.RandomState(101).randn(2, 112, 112, 3).astype(np.float32)
    with torch.no_grad():
        ref_out = ref(oracle.to_nchw(x)).numpy()
    out = np.asarray(arcface_apply(params, jnp.asarray(x)))
    np.testing.assert_allclose(out, ref_out, atol=2e-3, rtol=1e-2)


def test_vgg19_loss_shapes():
    from vtoonify_tpu.models.vgg import init_vgg19, vgg19_features, vgg_loss

    params = init_vgg19(jax.random.PRNGKey(0))
    x = jnp.zeros((1, 64, 64, 3))
    feats = vgg19_features(params, x)
    assert [f.shape[-1] for f in feats] == [64, 128, 256, 512, 512]
    assert [f.shape[1] for f in feats] == [64, 32, 16, 8, 4]
    loss = vgg_loss(params, x, x + 0.1)
    assert np.isfinite(float(loss))


def test_psp_full_wrapper():
    from vtoonify_tpu.models.psp import PSPConfig, init_psp, psp_apply

    cfg = PSPConfig(output_size=256)
    params = init_psp(jax.random.PRNGKey(1), cfg)
    x = jnp.zeros((1, 256, 256, 3))
    img = psp_apply(params, cfg, x, resize=True,
                    noise=[None] * cfg.decoder.num_layers)
    assert img.shape == (1, 256, 256, 3)
    img2, codes = psp_apply(params, cfg, x, resize=False, latent_mask=[2, 3],
                            noise=[None] * cfg.decoder.num_layers,
                            return_latents=True)
    assert img2.shape == (1, 256, 256, 3)
    assert codes.shape == (1, cfg.n_styles, 512)


def test_color_augment_parity():
    from model.stylegan.non_leaking import apply_color as ref_apply_color

    from vtoonify_tpu.train.augment_full import apply_color, sample_color

    rng = np.random.RandomState(102)
    img = rng.randn(2, 8, 8, 3).astype(np.float32)
    C = sample_color(jax.random.PRNGKey(2), 0.9, 2)
    ours = np.asarray(apply_color(jnp.asarray(img), C))
    ref = ref_apply_color(
        torch.from_numpy(np.transpose(img, (0, 3, 1, 2)).copy()),
        torch.from_numpy(np.asarray(C, np.float32)),
    )
    np.testing.assert_allclose(ours, oracle.to_nhwc(ref), atol=1e-5)


def test_adaptive_augment_controller():
    from vtoonify_tpu.train.augment_full import AdaptiveAugment

    ada = AdaptiveAugment(ada_aug_target=0.0, ada_aug_len=100, update_every=2)
    p = 0.0
    for _ in range(6):
        p = ada.tune(np.ones(4))  # D always confident → p should rise
    assert p > 0


def test_reduce_loss_dict():
    from vtoonify_tpu.parallel.collectives import reduce_loss_dict

    def f(x):
        return reduce_loss_dict({"a": x * 2, "b": x + 1}, axis_name="dp")

    n = jax.device_count()
    xs = jnp.arange(n, dtype=jnp.float32)
    out = jax.pmap(f, axis_name="dp")(xs)
    np.testing.assert_allclose(np.asarray(out["a"])[0],
                               np.mean(np.arange(n) * 2))
    np.testing.assert_allclose(np.asarray(out["b"])[0],
                               np.mean(np.arange(n) + 1))


def test_landmarker_predictor_fallback(tmp_path, monkeypatch):
    """ensure_predictor: missing model → download attempt (reference
    style_transfer.py:70-77) → in zero-egress envs, a clear instruction
    instead of a stack trace; VTOONIFY_NO_DOWNLOAD=1 forbids the fetch."""
    from vtoonify_tpu.pipeline.landmarks import (
        LandmarkError,
        StaticLandmarker,
        ensure_predictor,
        make_landmarker,
    )

    missing = str(tmp_path / "predictor.dat")
    monkeypatch.setenv("VTOONIFY_NO_DOWNLOAD", "1")
    with pytest.raises(LandmarkError, match="downloads are disabled"):
        ensure_predictor(missing)

    monkeypatch.delenv("VTOONIFY_NO_DOWNLOAD")
    monkeypatch.setattr(
        "vtoonify_tpu.pipeline.landmarks.PREDICTOR_URL",
        "http://127.0.0.1:9/nope.bz2")  # unroutable: forces the except path
    with pytest.raises(LandmarkError, match="wget"):
        ensure_predictor(missing)

    exists = tmp_path / "have.dat"
    exists.write_bytes(b"x")
    assert ensure_predictor(str(exists)) == str(exists)

    # --landmarks bypasses dlib entirely
    lm = np.zeros((68, 2), np.float32)
    lk = make_landmarker(predictor_path=missing, landmarks=lm)
    assert isinstance(lk, StaticLandmarker)

    with pytest.raises(LandmarkError, match="precomputed landmarks"):
        make_landmarker()


def test_model_api_registry():
    from vtoonify_tpu.pipeline.model_api import (
        STYLE_TYPES,
        dynamic_batch_size,
    )

    assert len(STYLE_TYPES) == 22
    assert STYLE_TYPES["cartoon1"][1] == 26
    assert dynamic_batch_size(400, 360) == 16    # measured saturation point
    assert dynamic_batch_size(256, 256) == 16    # standard 256px crop
    assert dynamic_batch_size(800, 720) == 4     # larger crops scale down
    assert dynamic_batch_size(1920, 1080) == 1
    assert dynamic_batch_size(0, 0) == 1
    assert dynamic_batch_size(256, 256, on_accelerator=False) == 4
