"""End-to-end trainer CLI smoke (tiny config): reference-format checkpoint
zoo → both train_vtoonify_d stages through cli.train_d.main() — covering the
observability surface (sample grids, metrics jsonl, device trace) and the
LPIPS gate (VERDICT r1 #3/#4)."""

import json
import os
from argparse import Namespace

import numpy as np
import pytest
import torch

from tests import reference_oracle as oracle

oracle.install()
from model.dualstylegan import DualStyleGAN  # noqa: E402
from model.bisenet.model import BiSeNet  # noqa: E402
from model.encoder.encoders.psp_encoders import GradualStyleEncoder  # noqa: E402

N_LATENT = 12  # tiny 128px generator: 2*log2(128)-2


@pytest.fixture(scope="module")
def tiny_zoo(tmp_path_factory):
    """Reference-format checkpoints at the --tiny config."""
    root = tmp_path_factory.mktemp("zoo")
    torch.manual_seed(11)
    g = DualStyleGAN(128, 512, 8, channel_multiplier=1)
    torch.save({"g_ema": g.state_dict()}, str(root / "generator.pt"))

    bn = BiSeNet(19)
    torch.save(bn.state_dict(), str(root / "faceparsing.pth"))

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

    rng = np.random.RandomState(12)
    bank = {
        f"style{i}.png": rng.randn(1, N_LATENT, 512).astype(np.float32) * 0.3
        for i in range(3)
    }
    np.save(str(root / "exstyle_code.npy"), bank, allow_pickle=True)
    np.save(str(root / "directions.npy"),
            rng.randn(4, N_LATENT, 512).astype(np.float32) * 0.1)
    return root


@pytest.mark.slow
def test_train_d_cli_both_stages(tiny_zoo, tmp_path, monkeypatch):
    from vtoonify_tpu.cli import train_d

    monkeypatch.chdir(tmp_path)
    common = [
        "--tiny", "--batch", "8", "--name", "smoke",
        "--stylegan_path", str(tiny_zoo / "generator.pt"),
        "--faceparsing_path", str(tiny_zoo / "faceparsing.pth"),
        "--style_encoder_path", str(tiny_zoo / "encoder.pt"),
        "--exstyle_path", str(tiny_zoo / "exstyle_code.npy"),
        "--direction_path", str(tiny_zoo / "directions.npy"),
        "--style_id", "1",
    ]

    # stage 1: encoder distillation
    train_d.main(common + ["--pretrain", "--iter", "2", "--log_every", "10",
                           "--save_every", "2", "--save_begin", "2",
                           "--export_pt"])
    assert os.path.exists("checkpoint/smoke/pretrain.ckpt")
    assert os.path.exists("checkpoint/smoke/pretrain.pt")  # --export_pt
    pre_metrics = [json.loads(line)
                   for line in open("log/smoke/metrics.jsonl")]
    assert len(pre_metrics) == 2 and "emse" in pre_metrics[0]

    # r5: pretrain keeps a full resumable state; --resume continues exactly
    # at the saved step (runs ONE more iteration, 2 -> 3; jit cache warm)
    assert os.path.exists("checkpoint/smoke/pretrain_state.ckpt")
    train_d.main(common + ["--pretrain", "--iter", "3", "--log_every", "10",
                           "--save_every", "3", "--save_begin", "3",
                           "--resume"])
    resumed = [json.loads(line) for line in open("log/smoke/metrics.jsonl")]
    assert [r["step"] for r in resumed] == [0, 1, 2]

    # stage 2 refuses to run with silently-random LPIPS
    with pytest.raises(ValueError, match="allow_random_lpips"):
        train_d.main(common + ["--iter", "2", "--log_every", "2"])

    os.remove("log/smoke/metrics.jsonl")
    train_d.main(common + ["--iter", "2", "--log_every", "2",
                           "--save_every", "2", "--save_begin", "2",
                           "--allow_random_lpips", "--profile", "1",
                           "--export_pt"])

    # scalar history: one json line per logged step
    recs = [json.loads(line) for line in open("log/smoke/metrics.jsonl")]
    assert [r["step"] for r in recs] == [0, 1]
    for k in ("d", "g", "gr", "gf", "msk", "tp", "d_s"):
        assert k in recs[0] and np.isfinite(recs[0][k])

    # fixed-sample grids seeded at iter 0, written at iter 0 and log_every
    from PIL import Image

    for name in ("00001.jpg", "00002.jpg"):
        grid = np.asarray(Image.open(f"log/smoke/{name}"))
        # rows: target, g_ema(fixed d_s), g_ema(current d_s); nrow = batch
        assert grid.shape == (3 * 256 + 4 * 2, 8 * 256 + 9 * 2, 3)

    # --profile left a device trace
    assert os.path.isdir("log/smoke/trace")
    assert any(f for _, _, fs in os.walk("log/smoke/trace") for f in fs)

    # final checkpoint + exact-resume state
    assert os.path.exists("checkpoint/smoke/vtoonify_s_d_c.ckpt")
    assert os.path.exists("checkpoint/smoke/train_state.ckpt")

    # --export_pt: reference-format torch checkpoint, strict-loadable
    import torch

    from tests import reference_oracle as oracle

    oracle.install()
    from model.vtoonify import VToonify

    ck = torch.load("checkpoint/smoke/vtoonify_s_d_c.pt", map_location="cpu")
    ref = VToonify(backbone="dualstylegan", in_size=32, out_size=128,
                   channel_multiplier=1, num_res_layers=2)
    ref.load_state_dict(ck["g_ema"], strict=True)


@pytest.fixture(scope="module")
def tiny_t_zoo(tmp_path_factory):
    """Reference-format checkpoints for the T trainer at --tiny."""
    from model.stylegan.model import Generator

    root = tmp_path_factory.mktemp("tzoo")
    torch.manual_seed(21)
    for name in ("stylegan.pt", "finetune.pt"):
        g = Generator(128, 512, 8, channel_multiplier=1)
        torch.save({"g_ema": g.state_dict()}, str(root / name))

    bn = BiSeNet(19)
    torch.save(bn.state_dict(), str(root / "faceparsing.pth"))

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
    rng = np.random.RandomState(22)
    np.save(str(root / "directions.npy"),
            rng.randn(4, N_LATENT, 512).astype(np.float32) * 0.1)
    return root


@pytest.mark.slow
def test_train_t_cli_both_stages(tiny_t_zoo, tmp_path, monkeypatch):
    """T-trainer CLI e2e at --tiny: blending → pretrain (+state resume
    artifact) → full GAN stage → --export_pt strict-loads into the reference
    VToonify('toonify') (train_vtoonify_t.py's whole surface)."""
    from vtoonify_tpu.cli import train_t

    monkeypatch.chdir(tmp_path)
    common = [
        "--tiny", "--batch", "8", "--name", "tsmoke",
        "--stylegan_path", str(tiny_t_zoo / "stylegan.pt"),
        "--finetunegan_path", str(tiny_t_zoo / "finetune.pt"),
        "--faceparsing_path", str(tiny_t_zoo / "faceparsing.pth"),
        "--style_encoder_path", str(tiny_t_zoo / "encoder.pt"),
        "--direction_path", str(tiny_t_zoo / "directions.npy"),
    ]

    train_t.main(common + ["--pretrain", "--iter", "2", "--log_every", "10",
                           "--save_every", "2", "--save_begin", "2"])
    assert os.path.exists("checkpoint/tsmoke/pretrain.ckpt")
    assert os.path.exists("checkpoint/tsmoke/pretrain_state.ckpt")

    train_t.main(common + ["--iter", "2", "--log_every", "2",
                           "--save_every", "2", "--save_begin", "2",
                           "--allow_random_lpips", "--export_pt"])
    recs = [json.loads(line) for line in open("log/tsmoke/metrics.jsonl")]
    for k in ("d", "g", "gr", "gf", "tp"):
        assert k in recs[-1] and np.isfinite(recs[-1][k])
    assert os.path.exists("checkpoint/tsmoke/vtoonify.ckpt")
    assert os.path.exists("checkpoint/tsmoke/train_state.ckpt")

    from model.vtoonify import VToonify

    ck = torch.load("checkpoint/tsmoke/vtoonify.pt", map_location="cpu")
    ref = VToonify(backbone="toonify", in_size=32, out_size=128,
                   channel_multiplier=1, num_res_layers=2)
    ref.load_state_dict(ck["g_ema"], strict=True)
