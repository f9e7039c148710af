"""Parity for the remaining reference util.py surface (g_path_regularize,
make_noise, mixing_noise — util.py:91-126; unused by VToonify's trainers but
part of the reference's capability surface) and the batch-alignment tool
(align_all_parallel.py:153-215)."""

import os

import numpy as np
import torch

import jax
import jax.numpy as jnp

from vtoonify_tpu.train.losses import (
    g_path_regularize,
    make_noise,
    mixing_noise,
)


def test_g_path_regularize_parity():
    rng = np.random.RandomState(60)
    B, L, D, H, W, C = 3, 4, 8, 5, 6, 3
    Wmat = rng.randn(L * D, H * W * C).astype(np.float32) * 0.2
    latents = rng.randn(B, L, D).astype(np.float32)
    noise = rng.randn(B, H, W, C).astype(np.float32) / np.sqrt(H * W)
    mean_pl = 0.7

    def g_fn(lat):
        flat = lat.reshape(lat.shape[0], -1) @ jnp.asarray(Wmat)
        return flat.reshape(lat.shape[0], H, W, C)

    penalty, new_mean, lengths = g_path_regularize(
        g_fn, jnp.asarray(latents), mean_pl, noise=jnp.asarray(noise)
    )

    # torch oracle, exactly the reference formula (util.py:91-108)
    lat_t = torch.from_numpy(latents).requires_grad_(True)
    fake_t = (lat_t.reshape(B, -1) @ torch.from_numpy(Wmat)).reshape(
        B, H, W, C
    )
    (grad_t,) = torch.autograd.grad(
        outputs=(fake_t * torch.from_numpy(noise)).sum(), inputs=lat_t,
        create_graph=True,
    )
    pl_t = torch.sqrt(grad_t.pow(2).sum(2).mean(1))
    pm_t = mean_pl + 0.01 * (pl_t.mean() - mean_pl)
    pen_t = (pl_t - pm_t).pow(2).mean()

    np.testing.assert_allclose(np.asarray(lengths),
                               pl_t.detach().numpy(), rtol=1e-5)
    np.testing.assert_allclose(float(new_mean), float(pm_t), rtol=1e-5)
    np.testing.assert_allclose(float(penalty), float(pen_t), rtol=1e-4)


def test_noise_samplers():
    key = jax.random.PRNGKey(0)
    z = make_noise(key, 4, 16, 1)
    assert z.shape == (4, 16)
    zs = make_noise(key, 4, 16, 3)
    assert isinstance(zs, list) and len(zs) == 3
    assert all(a.shape == (4, 16) for a in zs)

    assert len(mixing_noise(key, 4, 16, 0.0)) == 1
    assert len(mixing_noise(key, 4, 16, 1.0)) == 2
    # determinism: same key, same outcome
    a = mixing_noise(jax.random.PRNGKey(3), 4, 16, 0.5)
    b = mixing_noise(jax.random.PRNGKey(3), 4, 16, 0.5)
    assert len(a) == len(b)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def _make_align_tree(root):
    import cv2

    rng = np.random.RandomState(61)
    os.makedirs(os.path.join(root, "sub"), exist_ok=True)
    img = rng.randint(0, 255, (700, 700, 3), np.uint8)
    cv2.imwrite(os.path.join(root, "a.png"), img)
    cv2.imwrite(os.path.join(root, "sub", "b.jpg"), img)
    with open(os.path.join(root, "notes.txt"), "w") as f:
        f.write("skip me")
    # plausible frontal-face landmark layout (eyes ~64px apart scaled up)
    lm = np.zeros((68, 2), np.float32)
    lm[36:42] = [300, 320]  # left eye cluster
    lm[42:48] = [420, 320]  # right eye
    lm[48:68] = [360, 460]  # mouth
    lm[27:36] = [360, 380]  # nose
    lm_path = os.path.join(root, "..", "lm.npy")
    np.save(lm_path, lm)
    return lm_path


def test_align_batch_cli(tmp_path):
    from vtoonify_tpu.cli import align_batch

    root = str(tmp_path / "faces")
    lm_path = _make_align_tree(root)

    # returns a STATUS code (0 = every pending image aligned) — setuptools
    # console scripts pass the return through sys.exit()
    rc = align_batch.main(["--root_path", root, "--landmarks", lm_path])
    assert rc == 0
    out_a = os.path.join(root + "_crops", "a.jpg")
    out_b = os.path.join(root + "_crops", "sub", "b.jpg")
    assert os.path.exists(out_a) and os.path.exists(out_b)
    import cv2

    assert cv2.imread(out_a).shape == (256, 256, 3)
    # .txt skipped, existing outputs skipped on re-run
    assert not os.path.exists(os.path.join(root + "_crops", "notes.jpg"))
    assert align_batch.main(["--root_path", root, "--landmarks", lm_path]) == 0


def test_align_batch_cli_parallel(tmp_path):
    from vtoonify_tpu.cli import align_batch

    root = str(tmp_path / "faces")
    lm_path = _make_align_tree(root)
    rc = align_batch.main(["--root_path", root, "--landmarks", lm_path,
                           "--num_threads", "2"])
    assert rc == 0
