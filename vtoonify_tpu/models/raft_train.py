"""RAFT training harness, TPU-native (reference model/raft/train.py +
core/utils/augmentor.py + core/datasets.py — upstream tooling vendored by
VToonify but never wired into it; rebuilt here to complete the surface).

Design split (SURVEY §7.1): everything per-step differentiable runs as ONE
jitted function — forward over all refinement iterations, sequence loss,
AdamW + global-norm clipping + OneCycle LR — while the stochastic image
augmentation (photometric jitter, eraser, scale/stretch/flip/crop) stays on
host in numpy/cv2 feeding fixed-shape crops, exactly where the reference
keeps it (DataLoader workers). Batch-norm follows the reference's staging
exactly (train.py:146-147): batch-stats BN with running-buffer updates on
the 'chairs' stage (`RaftTrainConfig.train_bn`, set by the CLI), frozen
running-stats BN for every later stage; the BN affine parameters train in
both modes.

Augmentation is distribution-equivalent, not bit-matched — randomized
augmentation has no canonical bitstream (torchvision ColorJitter vs the
numpy/cv2 jitter here), but every parameter range, probability and crop rule
follows augmentor.py:15-120 (dense) / :122-238 (sparse).
"""

from __future__ import annotations

import os
from typing import List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from vtoonify_tpu.models.raft import RAFTConfig, raft_apply
from vtoonify_tpu.models.raft_data import read_flow_file

MAX_FLOW = 400.0  # exclude extreme displacements (train.py:41)


# --- loss (train.py sequence_loss, :47-73) -----------------------------------


def sequence_loss(flow_preds: Sequence[jnp.ndarray], flow_gt, valid,
                  gamma: float = 0.8, max_flow: float = MAX_FLOW):
    """Exponentially-weighted L1 over the refinement sequence.

    flow_preds: list of (B, H, W, 2); flow_gt (B, H, W, 2); valid (B, H, W).
    Matches the reference exactly: the per-iteration term averages the masked
    L1 over ALL pixels (invalid ones contribute zero to the numerator only),
    while the EPE metrics average over valid pixels.
    """
    n = len(flow_preds)
    mag = jnp.sqrt(jnp.sum(jnp.square(flow_gt), axis=-1))
    valid = (valid >= 0.5) & (mag < max_flow)
    vmask = valid.astype(jnp.float32)[..., None]

    loss = jnp.zeros((), jnp.float32)
    for i, pred in enumerate(flow_preds):
        w = gamma ** (n - i - 1)
        loss = loss + w * jnp.mean(vmask * jnp.abs(pred - flow_gt))

    epe = jnp.sqrt(jnp.sum(jnp.square(flow_preds[-1] - flow_gt), axis=-1))
    vf = valid.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(vf), 1.0)

    def vmean(x):
        return jnp.sum(x.astype(jnp.float32) * vf) / denom

    metrics = {
        "epe": vmean(epe),
        "1px": vmean(epe < 1),
        "3px": vmean(epe < 3),
        "5px": vmean(epe < 5),
    }
    return loss, metrics


# --- optimizer (train.py fetch_optimizer, :79-86) -----------------------------


def onecycle_linear_lr(lr: float, num_steps: int, pct_start: float = 0.05,
                       div_factor: float = 25.0,
                       final_div_factor: float = 1e4):
    """torch OneCycleLR(anneal_strategy='linear', cycle_momentum=False):
    linear lr/div_factor → lr over the first pct_start, then linear decay to
    (lr/div_factor)/final_div_factor. The reference schedules over
    num_steps+100 so training never reaches the final floor."""
    # torch phase boundaries: peak reached at step pct_start*total - 1, the
    # floor at step total - 1 (lr_scheduler.OneCycleLR._schedule_phases)
    warm = pct_start * num_steps - 1
    last = num_steps - 1
    init = lr / div_factor
    final = init / final_div_factor

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        rise = init + (lr - init) * step / jnp.maximum(warm, 1.0)
        fall = lr + (final - lr) * (step - warm) / jnp.maximum(
            last - warm, 1.0)
        return jnp.where(step <= warm, rise, fall)

    return schedule


class RaftTrainConfig(NamedTuple):
    lr: float = 2e-5
    num_steps: int = 100000
    wdecay: float = 5e-5
    epsilon: float = 1e-8
    clip: float = 1.0           # global-norm gradient clip (train.py:176)
    gamma: float = 0.8          # sequence-loss weighting
    iters: int = 12             # refinement iterations during training
    add_noise: bool = False     # per-batch U[0,5]-stdev gaussian (train.py:166)
    train_bn: bool = False      # batch-stats BN + running-buffer updates: the
    # reference trains BN on 'chairs' and freezes it for every later stage
    # (train.py:146-147) — the CLI sets this per stage


def _param_labels(params):
    """'freeze' for BatchNorm running statistics — buffers in the reference
    (never optimized, never part of the clipping norm); 'train' for
    everything else. BN affine weight/bias DO train, like torch
    AdamW(model.parameters())."""
    def label(path, _leaf):
        frozen = any(
            getattr(k, "key", None) in ("running_mean", "running_var")
            for k in path
        )
        return "freeze" if frozen else "train"
    return jax.tree_util.tree_map_with_path(label, params)


def make_raft_optimizer(tcfg: RaftTrainConfig):
    # +100 steps like the reference so lr never hits the terminal value
    sched = onecycle_linear_lr(tcfg.lr, tcfg.num_steps + 100)
    inner = optax.chain(
        optax.clip_by_global_norm(tcfg.clip),
        optax.adamw(sched, b1=0.9, b2=0.999, eps=tcfg.epsilon,
                    weight_decay=tcfg.wdecay),
    )
    return optax.multi_transform(
        {"train": inner, "freeze": optax.set_to_zero()}, _param_labels)


class RaftTrainState(NamedTuple):
    params: dict
    opt_state: tuple
    step: jnp.ndarray


def init_raft_train_state(params, tcfg: RaftTrainConfig) -> RaftTrainState:
    opt = make_raft_optimizer(tcfg)
    return RaftTrainState(params=params, opt_state=opt.init(params),
                          step=jnp.zeros((), jnp.int32))


def raft_train_step(state: RaftTrainState, image1, image2, flow_gt, valid,
                    cfg: RAFTConfig, tcfg: RaftTrainConfig, key):
    """One jitted iteration: [noise] → forward(all iters) → sequence loss →
    clipped AdamW update under the OneCycle schedule (train.py:160-182)."""
    if tcfg.add_noise:
        k1, k2, k3 = jax.random.split(key, 3)
        stdv = jax.random.uniform(k1) * 5.0
        image1 = jnp.clip(
            image1 + stdv * jax.random.normal(k2, image1.shape), 0.0, 255.0)
        image2 = jnp.clip(
            image2 + stdv * jax.random.normal(k3, image2.shape), 0.0, 255.0)

    opt = make_raft_optimizer(tcfg)

    def loss_fn(params):
        if tcfg.train_bn:
            preds, upd = raft_apply(params, image1, image2, cfg,
                                    iters=tcfg.iters, test_mode=False,
                                    train_bn=True)
        else:
            preds = raft_apply(params, image1, image2, cfg, iters=tcfg.iters,
                               test_mode=False)
            upd = None
        loss, metrics = sequence_loss(preds, flow_gt, valid, gamma=tcfg.gamma)
        return loss, (metrics, upd)

    (loss, (metrics, bn_upd)), grads = jax.value_and_grad(
        loss_fn, has_aux=True)(state.params)
    updates, opt_state = opt.update(grads, state.opt_state, state.params)
    params = optax.apply_updates(state.params, updates)
    if bn_upd is not None:
        # fold the new BN running buffers in (they are 'freeze'-labelled for
        # the optimizer, so the AdamW update left them untouched)
        def pick(path, old, new):
            k = getattr(path[-1], "key", None)
            return new if k in ("running_mean", "running_var") else old

        params = jax.tree_util.tree_map_with_path(pick, params, bn_upd)
    metrics = dict(metrics, loss=loss)
    return RaftTrainState(params, opt_state, state.step + 1), metrics


# --- host-side augmentation (core/utils/augmentor.py) -------------------------

_GRAY = np.array([0.2989, 0.587, 0.114])


def _color_jitter(rng: np.random.RandomState, img: np.ndarray,
                  brightness: float, contrast: float, saturation: float,
                  hue: float) -> np.ndarray:
    """torchvision ColorJitter semantics in numpy/cv2: uniform factors, the
    four adjustments applied in a random order."""
    import cv2

    out = img.astype(np.float32)
    ops = rng.permutation(4)
    for op in ops:
        if op == 0 and brightness > 0:
            f = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
            out = out * f
        elif op == 1 and contrast > 0:
            f = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
            mean = (out @ _GRAY).mean()
            out = f * out + (1 - f) * mean
        elif op == 2 and saturation > 0:
            f = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
            gray = (out @ _GRAY)[..., None]
            out = f * out + (1 - f) * gray
        elif op == 3 and hue > 0:
            f = rng.uniform(-hue, hue)  # fraction of the full circle
            hsv = cv2.cvtColor(
                np.clip(out, 0, 255).astype(np.uint8), cv2.COLOR_RGB2HSV)
            h = hsv[..., 0].astype(np.int32) + int(round(f * 180.0))
            hsv[..., 0] = np.mod(h, 180).astype(np.uint8)
            out = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB).astype(np.float32)
        out = np.clip(out, 0, 255)
    return out.astype(np.uint8)


class FlowAugmentor:
    """Dense-flow augmentation (augmentor.py:15-120): photometric jitter
    (asymmetric 20% of the time), occlusion eraser on frame 2, random
    scale/stretch, h/v flips with flow-sign fixes, fixed-size crop."""

    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5,
                 do_flip=True, seed: Optional[int] = None):
        self.crop_size = tuple(crop_size)
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.do_flip = do_flip
        self.spatial_aug_prob = 0.8
        self.stretch_prob = 0.8
        self.max_stretch = 0.2
        self.h_flip_prob = 0.5
        self.v_flip_prob = 0.1
        self.asymmetric_color_aug_prob = 0.2
        self.eraser_aug_prob = 0.5
        self.jitter = (0.4, 0.4, 0.4, 0.5 / 3.14)
        self.rng = np.random.RandomState(seed)

    def color_transform(self, img1, img2):
        if self.rng.rand() < self.asymmetric_color_aug_prob:
            img1 = _color_jitter(self.rng, img1, *self.jitter)
            img2 = _color_jitter(self.rng, img2, *self.jitter)
        else:
            stack = _color_jitter(self.rng, np.concatenate([img1, img2], 0),
                                  *self.jitter)
            img1, img2 = np.split(stack, 2, axis=0)
        return img1, img2

    def eraser_transform(self, img1, img2, bounds=(50, 100)):
        ht, wd = img1.shape[:2]
        if self.rng.rand() < self.eraser_aug_prob:
            img2 = img2.copy()
            mean_color = img2.reshape(-1, 3).mean(axis=0)
            for _ in range(self.rng.randint(1, 3)):
                x0 = self.rng.randint(0, wd)
                y0 = self.rng.randint(0, ht)
                dx = self.rng.randint(bounds[0], bounds[1])
                dy = self.rng.randint(bounds[0], bounds[1])
                img2[y0:y0 + dy, x0:x0 + dx] = mean_color
        return img1, img2

    def spatial_transform(self, img1, img2, flow):
        import cv2

        ht, wd = img1.shape[:2]
        min_scale = max((self.crop_size[0] + 8) / float(ht),
                        (self.crop_size[1] + 8) / float(wd))
        scale = 2 ** self.rng.uniform(self.min_scale, self.max_scale)
        sx = sy = scale
        if self.rng.rand() < self.stretch_prob:
            sx *= 2 ** self.rng.uniform(-self.max_stretch, self.max_stretch)
            sy *= 2 ** self.rng.uniform(-self.max_stretch, self.max_stretch)
        sx, sy = max(sx, min_scale), max(sy, min_scale)

        if self.rng.rand() < self.spatial_aug_prob:
            img1 = cv2.resize(img1, None, fx=sx, fy=sy,
                              interpolation=cv2.INTER_LINEAR)
            img2 = cv2.resize(img2, None, fx=sx, fy=sy,
                              interpolation=cv2.INTER_LINEAR)
            flow = cv2.resize(flow, None, fx=sx, fy=sy,
                              interpolation=cv2.INTER_LINEAR) * [sx, sy]

        if self.do_flip:
            if self.rng.rand() < self.h_flip_prob:
                img1, img2 = img1[:, ::-1], img2[:, ::-1]
                flow = flow[:, ::-1] * [-1.0, 1.0]
            if self.rng.rand() < self.v_flip_prob:
                img1, img2 = img1[::-1], img2[::-1]
                flow = flow[::-1] * [1.0, -1.0]

        # max(1,·): when the no-resize branch (prob 0.2) leaves the image
        # exactly crop-sized — e.g. FlyingChairs' native 384×512 with
        # --image_size 384 512 — offset 0 is the only valid crop (the
        # upstream augmentor crashes on randint(0, 0) here)
        y0 = self.rng.randint(0, max(1, img1.shape[0] - self.crop_size[0]))
        x0 = self.rng.randint(0, max(1, img1.shape[1] - self.crop_size[1]))
        sl = np.s_[y0:y0 + self.crop_size[0], x0:x0 + self.crop_size[1]]
        return img1[sl], img2[sl], flow[sl]

    def __call__(self, img1, img2, flow, valid=None):
        img1, img2 = self.color_transform(img1, img2)
        img1, img2 = self.eraser_transform(img1, img2)
        img1, img2, flow = self.spatial_transform(img1, img2, flow)
        img1 = np.ascontiguousarray(img1)
        img2 = np.ascontiguousarray(img2)
        flow = np.ascontiguousarray(flow.astype(np.float32))
        valid = (np.abs(flow[..., 0]) < 1000) & (np.abs(flow[..., 1]) < 1000)
        return img1, img2, flow, valid.astype(np.float32)


class SparseFlowAugmentor:
    """Sparse-flow (KITTI/HD1K) variant (augmentor.py:122-238): milder
    jitter, no stretch, nearest-valid-pixel flow-map resize, margin crop."""

    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5,
                 do_flip=False, seed: Optional[int] = None):
        self.crop_size = tuple(crop_size)
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.do_flip = do_flip
        self.spatial_aug_prob = 0.8
        self.h_flip_prob = 0.5
        self.eraser_aug_prob = 0.5
        self.jitter = (0.3, 0.3, 0.3, 0.3 / 3.14)
        self.rng = np.random.RandomState(seed)

    def color_transform(self, img1, img2):
        stack = _color_jitter(self.rng, np.concatenate([img1, img2], 0),
                              *self.jitter)
        return np.split(stack, 2, axis=0)

    def eraser_transform(self, img1, img2):
        ht, wd = img1.shape[:2]
        if self.rng.rand() < self.eraser_aug_prob:
            img2 = img2.copy()
            mean_color = img2.reshape(-1, 3).mean(axis=0)
            for _ in range(self.rng.randint(1, 3)):
                x0 = self.rng.randint(0, wd)
                y0 = self.rng.randint(0, ht)
                dx = self.rng.randint(50, 100)
                dy = self.rng.randint(50, 100)
                img2[y0:y0 + dy, x0:x0 + dx] = mean_color
        return img1, img2

    @staticmethod
    def resize_sparse_flow_map(flow, valid, fx=1.0, fy=1.0):
        ht, wd = flow.shape[:2]
        coords = np.stack(np.meshgrid(np.arange(wd), np.arange(ht)),
                          axis=-1).reshape(-1, 2).astype(np.float32)
        flow = flow.reshape(-1, 2).astype(np.float32)
        valid = valid.reshape(-1).astype(np.float32)

        coords0 = coords[valid >= 1]
        flow0 = flow[valid >= 1]
        ht1, wd1 = int(round(ht * fy)), int(round(wd * fx))
        coords1 = coords0 * [fx, fy]
        flow1 = flow0 * [fx, fy]
        xx = np.round(coords1[:, 0]).astype(np.int32)
        yy = np.round(coords1[:, 1]).astype(np.int32)
        keep = (xx > 0) & (xx < wd1) & (yy > 0) & (yy < ht1)

        flow_img = np.zeros((ht1, wd1, 2), np.float32)
        valid_img = np.zeros((ht1, wd1), np.int32)
        flow_img[yy[keep], xx[keep]] = flow1[keep]
        valid_img[yy[keep], xx[keep]] = 1
        return flow_img, valid_img

    def spatial_transform(self, img1, img2, flow, valid):
        import cv2

        ht, wd = img1.shape[:2]
        min_scale = max((self.crop_size[0] + 1) / float(ht),
                        (self.crop_size[1] + 1) / float(wd))
        scale = 2 ** self.rng.uniform(self.min_scale, self.max_scale)
        sx = sy = max(scale, min_scale)

        if self.rng.rand() < self.spatial_aug_prob:
            img1 = cv2.resize(img1, None, fx=sx, fy=sy,
                              interpolation=cv2.INTER_LINEAR)
            img2 = cv2.resize(img2, None, fx=sx, fy=sy,
                              interpolation=cv2.INTER_LINEAR)
            flow, valid = self.resize_sparse_flow_map(flow, valid, sx, sy)

        if self.do_flip and self.rng.rand() < self.h_flip_prob:
            img1, img2 = img1[:, ::-1], img2[:, ::-1]
            flow = flow[:, ::-1] * [-1.0, 1.0]
            valid = valid[:, ::-1]

        margin_y, margin_x = 20, 50
        y0 = self.rng.randint(0, img1.shape[0] - self.crop_size[0] + margin_y)
        x0 = self.rng.randint(-margin_x,
                              img1.shape[1] - self.crop_size[1] + margin_x)
        y0 = int(np.clip(y0, 0, img1.shape[0] - self.crop_size[0]))
        x0 = int(np.clip(x0, 0, img1.shape[1] - self.crop_size[1]))
        sl = np.s_[y0:y0 + self.crop_size[0], x0:x0 + self.crop_size[1]]
        return img1[sl], img2[sl], flow[sl], valid[sl]

    def __call__(self, img1, img2, flow, valid):
        img1, img2 = self.color_transform(img1, img2)
        img1, img2 = self.eraser_transform(img1, img2)
        img1, img2, flow, valid = self.spatial_transform(img1, img2, flow,
                                                         valid)
        return (np.ascontiguousarray(img1), np.ascontiguousarray(img2),
                np.ascontiguousarray(flow.astype(np.float32)),
                np.ascontiguousarray(valid.astype(np.float32)))


# --- dataset path indexes (core/datasets.py) ----------------------------------

Entry = Tuple[str, str, str, bool]  # (img1, img2, flow_path, sparse)


def index_sintel(root: str, dstype: str = "clean",
                 split: str = "training") -> List[Entry]:
    img_root = os.path.join(root, split, dstype)
    flow_root = os.path.join(root, split, "flow")
    entries = []
    for scene in sorted(os.listdir(img_root)):
        frames = sorted(os.listdir(os.path.join(img_root, scene)))
        for a, b in zip(frames[:-1], frames[1:]):
            entries.append((
                os.path.join(img_root, scene, a),
                os.path.join(img_root, scene, b),
                os.path.join(flow_root, scene,
                             os.path.splitext(a)[0] + ".flo"),
                False,
            ))
    return entries


def index_flying_chairs(root: str, split: str = "training",
                        split_file: Optional[str] = None) -> List[Entry]:
    """<root>/*.ppm pairs + *.flo; optional chairs_split.txt (1=train,
    2=validation) like datasets.FlyingChairs."""
    import glob as globmod

    images = sorted(globmod.glob(os.path.join(root, "*.ppm")))
    flows = sorted(globmod.glob(os.path.join(root, "*.flo")))
    labels = (np.loadtxt(split_file, dtype=np.int32)
              if split_file else np.ones(len(flows), np.int32))
    want = 1 if split == "training" else 2
    return [
        (images[2 * i], images[2 * i + 1], flows[i], False)
        for i in range(len(flows)) if labels[i] == want
    ]


def index_flying_things(root: str,
                        dstype: str = "frames_cleanpass") -> List[Entry]:
    import glob as globmod

    entries = []
    for direction in ("into_future", "into_past"):
        image_dirs = sorted(
            os.path.join(f, "left")
            for f in globmod.glob(os.path.join(root, dstype, "TRAIN/*/*")))
        flow_dirs = sorted(
            os.path.join(f, direction, "left")
            for f in globmod.glob(os.path.join(root,
                                               "optical_flow/TRAIN/*/*")))
        for idir, fdir in zip(image_dirs, flow_dirs):
            images = sorted(globmod.glob(os.path.join(idir, "*.png")))
            flows = sorted(globmod.glob(os.path.join(fdir, "*.pfm")))
            for i in range(len(flows) - 1):
                if direction == "into_future":
                    entries.append((images[i], images[i + 1], flows[i], False))
                else:
                    entries.append((images[i + 1], images[i], flows[i + 1],
                                    False))
    return entries


def index_kitti(root: str, split: str = "training") -> List[Entry]:
    img_root = os.path.join(root, split, "image_2")
    flow_root = os.path.join(root, split, "flow_occ")
    ids = sorted({f[:6] for f in os.listdir(img_root)})
    return [
        (os.path.join(img_root, f"{i}_10.png"),
         os.path.join(img_root, f"{i}_11.png"),
         os.path.join(flow_root, f"{i}_10.png"), True)
        for i in ids
    ]


def index_hd1k(root: str) -> List[Entry]:
    import glob as globmod

    entries = []
    seq = 0
    while True:
        flows = sorted(globmod.glob(os.path.join(
            root, "hd1k_flow_gt", "flow_occ", f"{seq:06d}_*.png")))
        images = sorted(globmod.glob(os.path.join(
            root, "hd1k_input", "image_2", f"{seq:06d}_*.png")))
        if not flows:
            break
        for i in range(len(flows) - 1):
            entries.append((images[i], images[i + 1], flows[i], True))
        seq += 1
    return entries


def fetch_stage(stage: str, image_size, roots: dict, seed: int = 0):
    """(entry, augmentor) list mirroring datasets.fetch_dataloader:199-236 —
    per-sub-dataset augmentation parameters and the C+T+K+S+H sampling
    weights. `roots` maps dataset name → directory."""
    items = []

    def add(entries, aug, weight=1):
        items.extend([(e, aug) for e in entries] * weight)

    if stage == "chairs":
        aug = FlowAugmentor(image_size, -0.1, 1.0, True, seed)
        add(index_flying_chairs(roots["chairs"], "training",
                                roots.get("chairs_split")), aug)
    elif stage == "things":
        aug = FlowAugmentor(image_size, -0.4, 0.8, True, seed)
        add(index_flying_things(roots["things"], "frames_cleanpass"), aug)
        add(index_flying_things(roots["things"], "frames_finalpass"), aug)
    elif stage == "sintel":
        aug = FlowAugmentor(image_size, -0.2, 0.6, True, seed)
        add(index_flying_things(roots["things"], "frames_cleanpass"), aug)
        add(index_sintel(roots["sintel"], "clean"), aug, weight=100)
        add(index_sintel(roots["sintel"], "final"), aug, weight=100)
        if "kitti" in roots:
            add(index_kitti(roots["kitti"]),
                SparseFlowAugmentor(image_size, -0.3, 0.5, True, seed),
                weight=200)
        if "hd1k" in roots:
            add(index_hd1k(roots["hd1k"]),
                SparseFlowAugmentor(image_size, -0.5, 0.2, True, seed),
                weight=5)
    elif stage == "kitti":
        aug = SparseFlowAugmentor(image_size, -0.2, 0.4, False, seed)
        add(index_kitti(roots["kitti"]), aug)
    else:
        raise ValueError(f"unknown stage: {stage}")
    return items


def load_entry(entry: Entry):
    """(img1, img2, flow, valid|None) uint8/float32 arrays from paths."""
    import cv2

    i1p, i2p, fp, sparse = entry
    img1 = cv2.cvtColor(cv2.imread(i1p), cv2.COLOR_BGR2RGB)
    img2 = cv2.cvtColor(cv2.imread(i2p), cv2.COLOR_BGR2RGB)
    flow, valid = read_flow_file(fp)
    if sparse and valid is None:
        raise ValueError(f"sparse entry without a valid mask: {fp}")
    return img1, img2, flow.astype(np.float32), valid


def batch_iterator(items, batch_size: int, seed: int = 0):
    """Infinite shuffled epochs of augmented fixed-shape batches
    (the DataLoader(shuffle=True, drop_last=True) analogue). Yields
    (image1, image2, flow, valid) float32/float32 NHWC stacks."""
    rng = np.random.RandomState(seed)
    while True:
        order = rng.permutation(len(items))
        for s in range(0, len(order) - batch_size + 1, batch_size):
            b1, b2, bf, bv = [], [], [], []
            for j in order[s:s + batch_size]:
                entry, aug = items[j]
                img1, img2, flow, valid = load_entry(entry)
                if valid is not None:
                    img1, img2, flow, valid = aug(img1, img2, flow, valid)
                else:
                    img1, img2, flow, valid = aug(img1, img2, flow)
                b1.append(img1)
                b2.append(img2)
                bf.append(flow)
                bv.append(valid)
            yield (np.stack(b1).astype(np.float32),
                   np.stack(b2).astype(np.float32),
                   np.stack(bf), np.stack(bv).astype(np.float32))


# --- CLI (train.py:216-245) ---------------------------------------------------


def main(argv=None):
    import argparse
    import time

    p = argparse.ArgumentParser(description="Train RAFT (TPU-native)")
    p.add_argument("--name", default="raft")
    p.add_argument("--stage", required=True,
                   choices=["chairs", "things", "sintel", "kitti"])
    p.add_argument("--restore_ckpt", default=None,
                   help="checkpoint to start from: a torch RAFT .pth/.pt "
                        "(converted on load) or a .ckpt saved by this "
                        "trainer — so the reference's train_standard.sh "
                        "stage chaining works with either format")
    p.add_argument("--mixed_precision", action="store_true",
                   help="bf16 matmul/conv compute with f32 storage — the "
                        "TPU analog of the reference's autocast (train.py); "
                        "no loss scaler needed with f32 master values")
    p.add_argument("--validation", type=str, nargs="+", default=[])
    p.add_argument("--lr", type=float, default=2e-5)
    p.add_argument("--num_steps", type=int, default=100000)
    p.add_argument("--batch_size", type=int, default=6)
    p.add_argument("--image_size", type=int, nargs=2, default=[384, 512])
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--wdecay", type=float, default=5e-5)
    p.add_argument("--epsilon", type=float, default=1e-8)
    p.add_argument("--clip", type=float, default=1.0)
    p.add_argument("--gamma", type=float, default=0.8)
    p.add_argument("--add_noise", action="store_true")
    p.add_argument("--freeze_bn", dest="freeze_bn", action="store_true",
                   default=None,
                   help="force running-stats BN; default follows the "
                        "reference (train BN on 'chairs', frozen after)")
    p.add_argument("--train_bn", dest="freeze_bn", action="store_false",
                   help="force batch-stats BN on any stage")
    p.add_argument("--data_root", type=str, default="datasets",
                   help="directory holding Sintel/ KITTI/ FlyingChairs_release/"
                        " FlyingThings3D/ HD1k/ trees")
    p.add_argument("--val_freq", type=int, default=5000)
    p.add_argument("--alt_corr", action="store_true",
                   help="memory-efficient on-the-fly correlation (reference "
                        "alt_cuda_corr equivalent); exact, trades compute "
                        "for the O((H*W)^2) volume's HBM")
    p.add_argument("--seed", type=int, default=1234)
    args = p.parse_args(argv)

    from vtoonify_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if args.mixed_precision:
        jax.config.update("jax_default_matmul_precision", "bfloat16")

    from vtoonify_tpu.models.raft import init_raft
    from vtoonify_tpu.models.raft_data import validate_kitti, validate_sintel
    from vtoonify_tpu.utils import checkpoint as ckpt_util

    cfg = RAFTConfig(corr_impl="alt" if args.alt_corr else "allpairs")
    freeze_bn = (args.stage != "chairs" if args.freeze_bn is None
                 else args.freeze_bn)
    tcfg = RaftTrainConfig(lr=args.lr, num_steps=args.num_steps,
                           wdecay=args.wdecay, epsilon=args.epsilon,
                           clip=args.clip, gamma=args.gamma,
                           iters=args.iters, add_noise=args.add_noise,
                           train_bn=not freeze_bn)

    if args.restore_ckpt and args.restore_ckpt.endswith(".ckpt"):
        # this trainer's own Orbax pytree (stage chaining à la
        # train_standard.sh: chairs → things → sintel → kitti)
        params = ckpt_util.load_pytree(
            args.restore_ckpt, target=init_raft(jax.random.PRNGKey(0)))
    elif args.restore_ckpt:
        import torch

        from vtoonify_tpu.convert.torch_import import convert_raft

        sd = {k.replace("module.", "", 1): v
              for k, v in torch.load(args.restore_ckpt,
                                     map_location="cpu").items()}
        params = convert_raft(sd)
    else:
        params = init_raft(jax.random.PRNGKey(args.seed))

    roots = {
        "chairs": os.path.join(args.data_root, "FlyingChairs_release/data"),
        "chairs_split": (os.path.join(args.data_root, "chairs_split.txt")
                         if os.path.exists(os.path.join(
                             args.data_root, "chairs_split.txt")) else None),
        "things": os.path.join(args.data_root, "FlyingThings3D"),
        "sintel": os.path.join(args.data_root, "Sintel"),
        "kitti": os.path.join(args.data_root, "KITTI"),
        "hd1k": os.path.join(args.data_root, "HD1k"),
    }
    roots = {k: v for k, v in roots.items()
             if v is not None and (k == "chairs_split" or os.path.isdir(v))}
    items = fetch_stage(args.stage, args.image_size, roots, args.seed)
    print(f"Training with {len(items)} image pairs")

    state = init_raft_train_state(params, tcfg)
    step_fn = jax.jit(raft_train_step, donate_argnums=(0,),
                      static_argnames=("cfg", "tcfg"))
    os.makedirs("checkpoints", exist_ok=True)

    key = jax.random.PRNGKey(args.seed)
    batches = batch_iterator(items, args.batch_size, args.seed)
    running = {}
    t0 = time.time()
    for step in range(args.num_steps):
        image1, image2, flow, valid = next(batches)
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, jnp.asarray(image1),
                                 jnp.asarray(image2), jnp.asarray(flow),
                                 jnp.asarray(valid), cfg, tcfg, sub)
        for k, v in metrics.items():
            running[k] = running.get(k, 0.0) + float(v)
        if (step + 1) % 100 == 0:
            avg = {k: v / 100 for k, v in running.items()}
            rate = (time.time() - t0) / (step + 1)
            print(f"[{step + 1:6d}] " + ", ".join(
                f"{k} {v:.4f}" for k, v in sorted(avg.items()))
                + f" ({rate:.2f} s/it)", flush=True)
            running = {}
        if (step + 1) % args.val_freq == 0 or (step + 1) == args.num_steps:
            ckpt_util.save_pytree(
                f"checkpoints/{step + 1}_{args.name}.ckpt", state.params)
            for val in args.validation:
                if val == "chairs" and "chairs" in roots:
                    from vtoonify_tpu.models.raft_data import validate_chairs

                    print(validate_chairs(
                        state.params, roots["chairs"],
                        split_file=roots.get("chairs_split"),
                        iters=args.iters, cfg=cfg))
                elif val == "sintel" and "sintel" in roots:
                    print(validate_sintel(state.params, roots["sintel"],
                                          iters=args.iters, cfg=cfg))
                elif val == "kitti" and "kitti" in roots:
                    print(validate_kitti(state.params, roots["kitti"],
                                         iters=args.iters, cfg=cfg))

    ckpt_util.save_pytree(f"checkpoints/{args.name}.ckpt", state.params)
    print(f"saved checkpoints/{args.name}.ckpt")


if __name__ == "__main__":
    main()
