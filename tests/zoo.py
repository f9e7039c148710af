"""Shared synthetic checkpoint-zoo builder for the e2e tests.

Builds a checkpoint_root in the exact released layout the Model API expects
(reference checkpoint/README.md:4-35): faceparsing.pth + encoder.pt at the
root, style checkpoints + exstyle bank per style directory — all tiny
random-init reference-format torch checkpoints, so the full converter path is
exercised. Used by test_serve.py, test_playground.py and
test_validate_release.py (keep layout changes here, in one place).
"""

from argparse import Namespace

import numpy as np
import torch

from tests import reference_oracle as oracle

N_LATENT = 12


def build_zoo(root, style_dirname="vtoonify_d_arcane", *, torch_seed: int,
              bank_seed: int, n_bank_styles: int = 1,
              extra_ckpt_names=(), n_latent: int = N_LATENT):
    """Populate `root` (a pathlib dir) as a reference-format zoo; returns it.

    extra_ckpt_names: additional style-checkpoint filenames (e.g.
    "vtoonify_s026_d0.5.pt") saved with the same tiny VToonify weights.
    """
    oracle.install()
    from model.bisenet.model import BiSeNet
    from model.encoder.encoders.psp_encoders import GradualStyleEncoder
    from model.vtoonify import VToonify

    torch.manual_seed(torch_seed)
    style_dir = root / style_dirname
    style_dir.mkdir()
    vt = VToonify(in_size=32, out_size=128, channel_multiplier=1,
                  num_res_layers=2, backbone="dualstylegan")
    torch.save({"g_ema": vt.state_dict()}, str(style_dir / "vtoonify_s_d.pt"))
    for name in extra_ckpt_names:
        torch.save({"g_ema": vt.state_dict()}, str(style_dir / name))
    torch.save(BiSeNet(19).state_dict(), str(root / "faceparsing.pth"))
    enc = GradualStyleEncoder(50, "ir_se",
                              Namespace(input_nc=3, n_styles=n_latent))
    torch.save(
        {
            "state_dict": {"encoder." + k: v
                           for k, v in enc.state_dict().items()},
            "latent_avg": torch.randn(n_latent, 512),
        },
        str(root / "encoder.pt"),
    )
    rng = np.random.RandomState(bank_seed)
    bank = {
        f"style{i}.png": rng.randn(1, n_latent, 512).astype(np.float32) * 0.3
        for i in range(n_bank_styles)
    }
    np.save(str(style_dir / "exstyle_code.npy"), bank, allow_pickle=True)
    return root


def portrait_landmarks() -> np.ndarray:
    """Plausible 68-pt landmarks for a ~500×375 synthetic portrait
    (eyes / nose / mouth blocks where the aligner expects them)."""
    lm = np.zeros((68, 2), np.float32)
    lm[36:42] = [190, 150]
    lm[42:48] = [300, 150]
    lm[27:36] = [245, 200]
    lm[48:68] = [245, 260]
    return lm
