"""RAFT training harness: sequence loss vs the reference train.py oracle,
OneCycle LR vs torch's scheduler, augmentor semantics, one real train step."""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vtoonify_tpu.models.raft import RAFTConfig, init_raft
from vtoonify_tpu.models.raft_train import (
    FlowAugmentor,
    RaftTrainConfig,
    SparseFlowAugmentor,
    batch_iterator,
    fetch_stage,
    init_raft_train_state,
    onecycle_linear_lr,
    raft_train_step,
    sequence_loss,
)


def _ref_sequence_loss():
    """Extract train.py's sequence_loss with its heavy deps stubbed out
    (tensorboard/torchvision are absent in this environment; the loss itself
    only needs torch)."""
    import importlib.util

    for name in ("raft", "evaluate", "datasets"):
        sys.modules.setdefault(name, types.ModuleType(name))
    tb = types.ModuleType("torch.utils.tensorboard")
    tb.SummaryWriter = object
    sys.modules.setdefault("torch.utils.tensorboard", tb)
    sys.modules["raft"].RAFT = object

    spec = importlib.util.spec_from_file_location(
        "ref_raft_train", "/root/reference/model/raft/train.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.sequence_loss


def test_sequence_loss_parity():
    import torch

    ref_loss = _ref_sequence_loss()
    rng = np.random.RandomState(80)
    b, h, w, n = 2, 12, 16, 4
    preds = [rng.randn(b, h, w, 2).astype(np.float32) * 3 for _ in range(n)]
    gt = rng.randn(b, h, w, 2).astype(np.float32) * 3
    # some extreme displacements + some invalid pixels
    gt[0, 0, 0] = 500.0
    valid = (rng.rand(b, h, w) > 0.3).astype(np.float32)

    loss_j, metrics_j = sequence_loss(
        [jnp.asarray(p) for p in preds], jnp.asarray(gt), jnp.asarray(valid),
        gamma=0.8,
    )
    loss_t, metrics_t = ref_loss(
        [torch.from_numpy(p).permute(0, 3, 1, 2) for p in preds],
        torch.from_numpy(gt).permute(0, 3, 1, 2),
        torch.from_numpy(valid), gamma=0.8,
    )
    np.testing.assert_allclose(float(loss_j), float(loss_t), rtol=1e-5)
    for k in ("epe", "1px", "3px", "5px"):
        np.testing.assert_allclose(float(metrics_j[k]), metrics_t[k],
                                   rtol=1e-5)


def test_onecycle_matches_torch():
    import torch

    lr, num_steps = 2e-5, 400
    sched = onecycle_linear_lr(lr, num_steps + 100)

    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    ref = torch.optim.lr_scheduler.OneCycleLR(
        opt, lr, num_steps + 100, pct_start=0.05, cycle_momentum=False,
        anneal_strategy="linear",
    )
    # torch's scheduler value at step k is read before the k-th .step()
    for k in range(num_steps):
        np.testing.assert_allclose(
            float(sched(k)), ref.get_last_lr()[0], rtol=1e-4,
            err_msg=f"step {k}",
        )
        opt.step()
        ref.step()


def test_flow_augmentor_semantics():
    rng = np.random.RandomState(81)
    img1 = rng.randint(0, 255, (60, 80, 3), np.uint8)
    img2 = rng.randint(0, 255, (60, 80, 3), np.uint8)
    flow = rng.randn(60, 80, 2).astype(np.float32) * 4

    aug = FlowAugmentor((40, 56), seed=5)
    for _ in range(8):  # hits flip/scale/jitter branches across draws
        a1, a2, f, v = aug(img1, img2, flow)
        assert a1.shape == (40, 56, 3) and a1.dtype == np.uint8
        assert f.shape == (40, 56, 2) and f.dtype == np.float32
        assert v.shape == (40, 56) and v.min() >= 0 and v.max() <= 1
        assert np.isfinite(f).all()

    # deterministic under the same seed
    a = FlowAugmentor((40, 56), seed=7)(img1, img2, flow)
    b = FlowAugmentor((40, 56), seed=7)(img1, img2, flow)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_sparse_resize_flow_map():
    """Upscaling a sparse map keeps every surviving pixel's flow scaled and
    never invents validity (augmentor.py:162-196 semantics)."""
    flow = np.zeros((20, 30, 2), np.float32)
    valid = np.zeros((20, 30), np.float32)
    flow[5, 7] = (2.0, -1.0)
    valid[5, 7] = 1
    flow[10, 20] = (0.5, 3.0)
    valid[10, 20] = 1

    f2, v2 = SparseFlowAugmentor.resize_sparse_flow_map(flow, valid,
                                                        fx=2.0, fy=2.0)
    assert f2.shape == (40, 60, 2) and v2.sum() == 2
    np.testing.assert_allclose(f2[10, 14], (4.0, -2.0))
    np.testing.assert_allclose(f2[20, 40], (1.0, 6.0))


def test_sparse_augmentor_shapes():
    rng = np.random.RandomState(82)
    img1 = rng.randint(0, 255, (60, 80, 3), np.uint8)
    img2 = rng.randint(0, 255, (60, 80, 3), np.uint8)
    flow = rng.randn(60, 80, 2).astype(np.float32)
    valid = (rng.rand(60, 80) > 0.5).astype(np.float32)
    aug = SparseFlowAugmentor((40, 56), seed=6)
    a1, a2, f, v = aug(img1, img2, flow, valid)
    assert a1.shape == (40, 56, 3) and f.shape == (40, 56, 2)
    assert set(np.unique(v)).issubset({0.0, 1.0})


def _mini_sintel(root):
    import cv2

    from vtoonify_tpu.models.raft_data import write_flo

    rng = np.random.RandomState(83)
    img_dir = os.path.join(root, "training", "clean", "alley_1")
    flow_dir = os.path.join(root, "training", "flow", "alley_1")
    os.makedirs(img_dir), os.makedirs(flow_dir)
    for i in (1, 2, 3):
        cv2.imwrite(os.path.join(img_dir, f"frame_{i:04d}.png"),
                    rng.randint(0, 255, (50, 66, 3), np.uint8))
    for i in (1, 2):
        write_flo(os.path.join(flow_dir, f"frame_{i:04d}.flo"),
                  rng.randn(50, 66, 2).astype(np.float32))


def test_fetch_stage_and_batch_iterator(tmp_path):
    from vtoonify_tpu.models.raft_train import index_sintel

    _mini_sintel(str(tmp_path / "Sintel"))
    entries = index_sintel(str(tmp_path / "Sintel"))
    assert len(entries) == 2
    aug = FlowAugmentor((32, 48), seed=1)
    items = [(e, aug) for e in entries]
    it = batch_iterator(items, batch_size=2, seed=0)
    img1, img2, flow, valid = next(it)
    assert img1.shape == (2, 32, 48, 3) and img1.dtype == np.float32
    assert flow.shape == (2, 32, 48, 2) and valid.shape == (2, 32, 48)

    with pytest.raises(ValueError, match="unknown stage"):
        fetch_stage("nope", (32, 48), {})


def test_read_pfm_roundtrip(tmp_path):
    from vtoonify_tpu.models.raft_data import read_flow_file, read_pfm

    rng = np.random.RandomState(84)
    data = rng.randn(12, 17, 3).astype(np.float32)
    path = str(tmp_path / "flow.pfm")
    with open(path, "wb") as f:  # little-endian color PFM, bottom-up rows
        f.write(b"PF\n17 12\n-1.0\n")
        f.write(np.flipud(data).astype("<f4").tobytes())
    np.testing.assert_allclose(read_pfm(path), data, rtol=1e-6)
    flow, valid = read_flow_file(path)
    assert flow.shape == (12, 17, 2) and valid is None
    np.testing.assert_allclose(flow, data[:, :, :2], rtol=1e-6)


def test_raft_train_step():
    """Two real optimization steps on tiny frames: finite losses, moving
    weights, frozen BatchNorm buffers (reference freeze_bn semantics)."""
    rng = np.random.RandomState(85)
    params = init_raft(jax.random.PRNGKey(2))
    # snapshot before stepping: donate_argnums hands the param buffers to XLA
    flow_head_w0 = np.asarray(
        params["update"]["flow_head"]["conv1"]["weight"])
    bn_var0 = np.asarray(params["cnet"]["bn1"]["running_var"])
    tcfg = RaftTrainConfig(lr=1e-4, num_steps=10, iters=2, add_noise=True)
    state = init_raft_train_state(params, tcfg)
    cfg = RAFTConfig()

    step = jax.jit(raft_train_step, donate_argnums=(0,),
                   static_argnames=("cfg", "tcfg"))
    img1 = jnp.asarray(rng.rand(2, 48, 64, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(rng.rand(2, 48, 64, 3).astype(np.float32) * 255)
    flow = jnp.asarray(rng.randn(2, 48, 64, 2).astype(np.float32))
    valid = jnp.ones((2, 48, 64), jnp.float32)

    losses = []
    for i in range(2):
        state, metrics = step(state, img1, img2, flow, valid, cfg, tcfg,
                              jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
        assert all(np.isfinite(float(v)) for v in metrics.values())
    assert int(state.step) == 2

    # weights moved; BN running stats did not
    moved = float(jnp.abs(
        state.params["update"]["flow_head"]["conv1"]["weight"]
        - flow_head_w0).sum())
    assert moved > 0
    np.testing.assert_array_equal(
        np.asarray(state.params["cnet"]["bn1"]["running_var"]), bn_var0)


def test_batch_norm_train_mode_matches_torch():
    """batch_norm_2d_train vs torch BatchNorm2d(train mode) — outputs AND
    running-buffer updates over two consecutive batches (biased batch var in
    the normalization, unbiased in the buffer, momentum 0.1)."""
    import torch

    from vtoonify_tpu.nn.layers import batch_norm_2d_train

    rng = np.random.RandomState(90)
    c = 5
    bn = torch.nn.BatchNorm2d(c)
    with torch.no_grad():
        bn.weight.copy_(torch.tensor(rng.randn(c).astype(np.float32)))
        bn.bias.copy_(torch.tensor(rng.randn(c).astype(np.float32)))
    bn.train()

    p = {
        "weight": jnp.asarray(bn.weight.detach().numpy()),
        "bias": jnp.asarray(bn.bias.detach().numpy()),
        "running_mean": jnp.zeros((c,), jnp.float32),
        "running_var": jnp.ones((c,), jnp.float32),
    }
    for i in range(2):
        x = rng.randn(3, 8, 6, c).astype(np.float32) * 2 + i
        with torch.no_grad():
            y_t = bn(torch.tensor(x.transpose(0, 3, 1, 2)))
        y_j, p = batch_norm_2d_train(p, jnp.asarray(x))
        np.testing.assert_allclose(
            np.asarray(y_j), y_t.numpy().transpose(0, 2, 3, 1),
            rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(p["running_mean"]),
                               bn.running_mean.numpy(), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(p["running_var"]),
                               bn.running_var.numpy(), rtol=1e-5, atol=1e-6)


def test_raft_train_step_train_bn():
    """The 'chairs'-stage mode (train_bn=True): BN running buffers move with
    batch statistics while the step stays finite — reference
    model/raft/train.py:146-147 only freezes BN after chairs."""
    rng = np.random.RandomState(86)
    params = init_raft(jax.random.PRNGKey(3))
    bn_mean0 = np.asarray(params["cnet"]["bn1"]["running_mean"])
    inner_var0 = np.asarray(
        params["cnet"]["layers"][1][0]["norms"]["norm3"]["running_var"])
    tcfg = RaftTrainConfig(lr=1e-4, num_steps=10, iters=2, train_bn=True)
    state = init_raft_train_state(params, tcfg)
    cfg = RAFTConfig()

    step = jax.jit(raft_train_step, donate_argnums=(0,),
                   static_argnames=("cfg", "tcfg"))
    img1 = jnp.asarray(rng.rand(2, 48, 64, 3).astype(np.float32) * 255)
    img2 = jnp.asarray(rng.rand(2, 48, 64, 3).astype(np.float32) * 255)
    flow = jnp.asarray(rng.randn(2, 48, 64, 2).astype(np.float32))
    valid = jnp.ones((2, 48, 64), jnp.float32)

    state, metrics = step(state, img1, img2, flow, valid, cfg, tcfg,
                          jax.random.PRNGKey(0))
    assert all(np.isfinite(float(v)) for v in metrics.values())
    new_mean = np.asarray(state.params["cnet"]["bn1"]["running_mean"])
    new_inner = np.asarray(
        state.params["cnet"]["layers"][1][0]["norms"]["norm3"]["running_var"])
    assert np.abs(new_mean - bn_mean0).max() > 0
    assert np.abs(new_inner - inner_var0).max() > 0
    # fnet has no BN; its instance-norm path must be unaffected by the flag
    assert "bn1" not in state.params["fnet"]


def test_raft_train_cli(tmp_path, monkeypatch, capsys):
    """Drive the vtoonify-raft-train CLI end to end on a mini KITTI tree:
    2 real optimizer steps at tiny crops, checkpoint written."""
    import cv2

    from vtoonify_tpu.models.raft_data import write_kitti_flow
    from vtoonify_tpu.models.raft_train import main

    rng = np.random.RandomState(86)
    root = tmp_path / "data" / "KITTI" / "training"
    os.makedirs(root / "image_2"), os.makedirs(root / "flow_occ")
    for i in ("000000", "000001"):
        for t in ("10", "11"):
            cv2.imwrite(str(root / "image_2" / f"{i}_{t}.png"),
                        rng.randint(0, 255, (40, 56, 3), np.uint8))
        write_kitti_flow(str(root / "flow_occ" / f"{i}_10.png"),
                         rng.randn(40, 56, 2).astype(np.float32))

    monkeypatch.chdir(tmp_path)
    main(["--stage", "kitti", "--num_steps", "2", "--batch_size", "1",
          "--image_size", "32", "48", "--iters", "2",
          "--data_root", str(tmp_path / "data"), "--name", "mini"])
    assert os.path.exists(tmp_path / "checkpoints" / "mini.ckpt")
    out = capsys.readouterr().out
    assert "Training with 2 image pairs" in out


def test_raft_train_cli_stage_chaining(tmp_path, monkeypatch, capsys):
    """train_standard.sh-style stage chaining: restore the trainer's own
    .ckpt for the next stage (plus --mixed_precision accepted), and
    --validation chairs runs the validate_chairs driver."""
    import cv2

    from vtoonify_tpu.models.raft_data import write_flo
    from vtoonify_tpu.models.raft_train import main

    rng = np.random.RandomState(87)
    chairs = tmp_path / "data" / "FlyingChairs_release" / "data"
    os.makedirs(str(chairs))
    for i in (1, 2):
        for t in (1, 2):
            cv2.imwrite(str(chairs / f"{i:05d}_img{t}.ppm"),
                        rng.randint(0, 255, (40, 56, 3), np.uint8))
        write_flo(str(chairs / f"{i:05d}_flow.flo"),
                  rng.randn(40, 56, 2).astype(np.float32))
    (tmp_path / "data" / "chairs_split.txt").write_text("1\n2\n")

    monkeypatch.chdir(tmp_path)
    common = ["--num_steps", "1", "--batch_size", "1",
              "--image_size", "32", "48", "--iters", "2",
              "--data_root", str(tmp_path / "data")]
    main(["--stage", "chairs", "--name", "stage1",
          "--validation", "chairs", "--val_freq", "1"] + common)
    ckpt = tmp_path / "checkpoints" / "stage1.ckpt"
    assert os.path.exists(str(ckpt))
    main(["--stage", "chairs", "--name", "stage2", "--mixed_precision",
          "--restore_ckpt", str(ckpt)] + common)
    assert os.path.exists(str(tmp_path / "checkpoints" / "stage2.ckpt"))
    out = capsys.readouterr().out
    assert "epe" in out  # validate_chairs printed its metric dict
