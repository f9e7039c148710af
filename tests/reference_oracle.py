"""Import the reference PyTorch implementation as a *test oracle*.

The reference at /root/reference is used exactly the way a converted
pretrained checkpoint would be: instantiate its torch modules (random init),
convert their state_dicts with vtoonify_tpu.convert, and compare forward
outputs. Its CUDA extension package is aliased to the pure-torch op_cpu
fallback (the reference's own hermetic path, model/stylegan/op_cpu/readme.md),
and net-downloading init hooks are stubbed out (zero-egress environment).

Runtime framework code never imports anything from here.
"""

import sys
import types

import numpy as np
import torch

_REFERENCE = "/root/reference"
_installed = False


def install():
    global _installed
    if _installed:
        return
    if _REFERENCE not in sys.path:
        sys.path.insert(0, _REFERENCE)

    # Alias the CUDA op package to the CPU fallback before anything imports it.
    import model.stylegan.op_cpu as op_cpu
    from model.stylegan.op_cpu import conv2d_gradfix

    fake = types.ModuleType("model.stylegan.op")
    fake.FusedLeakyReLU = op_cpu.FusedLeakyReLU
    fake.fused_leaky_relu = op_cpu.fused_leaky_relu
    fake.upfirdn2d = op_cpu.upfirdn2d
    fake.conv2d_gradfix = conv2d_gradfix
    sys.modules["model.stylegan.op"] = fake

    # Stub torchvision-model-zoo downloads (no egress): Resnet18.init_weight
    # calls model_zoo.load_url; return an empty dict so random init stands.
    try:
        import torch.utils.model_zoo as model_zoo

        model_zoo.load_url = lambda *a, **k: {}
    except Exception:
        pass

    # torchvision itself is absent; reference modules import it at module
    # level (BiSeNet, util.py) but the oracle paths never call into it.
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        for name in ("Compose", "ToTensor", "Normalize", "Resize"):
            setattr(tvt, name, lambda *a, **k: None)
        tvu = types.ModuleType("torchvision.utils")
        tv.transforms = tvt
        tv.utils = tvu
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.utils"] = tvu

    # dlib is absent; align_all_parallel imports it at module level but tests
    # inject landmarks directly.
    if "dlib" not in sys.modules:
        dl = types.ModuleType("dlib")
        dl.get_frontal_face_detector = lambda: (lambda img, n: [])
        dl.shape_predictor = lambda path: None
        sys.modules["dlib"] = dl

    _installed = True


def to_nchw(x_nhwc: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.transpose(np.asarray(x_nhwc), (0, 3, 1, 2)).copy())


def to_nhwc(t: torch.Tensor) -> np.ndarray:
    return np.transpose(t.detach().cpu().numpy(), (0, 2, 3, 1))
