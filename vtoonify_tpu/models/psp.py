"""Full pSp wrapper (encoder + StyleGAN decoder).

Capability-parity with reference model/encoder/psp.py:20-125 (exists for
completeness; the main pipelines use the standalone encoder loader,
util.py:143-161): encode → latent-avg centering → optional latent
masking/mixing → decode, with z+/w+ switching and 256² face pooling.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence

import jax
import jax.numpy as jnp

from vtoonify_tpu.models import generator as G
from vtoonify_tpu.models.psp_encoder import (
    PSPEncoderConfig,
    init_psp_encoder,
    psp_encoder_apply,
)
from vtoonify_tpu.ops.interp import avg_pool


@dataclass(frozen=True)
class PSPConfig:
    output_size: int = 1024
    start_from_latent_avg: bool = True

    @property
    def n_styles(self) -> int:
        import math

        return int(math.log2(self.output_size)) * 2 - 2

    @property
    def encoder(self) -> PSPEncoderConfig:
        return PSPEncoderConfig(n_styles=self.n_styles)

    @property
    def decoder(self) -> G.GeneratorConfig:
        return G.GeneratorConfig(size=self.output_size)


def init_psp(key, cfg: PSPConfig):
    k1, k2 = jax.random.split(key)
    return {
        "encoder": init_psp_encoder(k1, cfg.encoder),
        "decoder": G.init_generator(k2, cfg.decoder),
        "latent_avg": jnp.zeros((cfg.n_styles, 512), jnp.float32),
    }


def psp_apply(
    params,
    cfg: PSPConfig,
    x,
    *,
    resize: bool = True,
    latent_mask: Optional[Sequence[int]] = None,
    inject_latent=None,
    alpha: Optional[float] = None,
    input_code: bool = False,
    noise=None,
    z_plus_latent: bool = False,
    return_latents: bool = False,
):
    if input_code:
        codes = x
    else:
        codes = psp_encoder_apply(params["encoder"], cfg.encoder, x)
        if cfg.start_from_latent_avg:
            codes = codes + params["latent_avg"][None]

    if latent_mask is not None:
        cols = [codes[:, i] for i in range(codes.shape[1])]
        for i in latent_mask:
            if inject_latent is not None:
                if alpha is not None:
                    cols[i] = alpha * inject_latent[:, i] + (1 - alpha) * cols[i]
                else:
                    cols[i] = inject_latent[:, i]
            else:
                cols[i] = jnp.zeros_like(cols[i])
        codes = jnp.stack(cols, axis=1)

    input_is_latent = not input_code and not z_plus_latent
    images = G.generate(
        params["decoder"], cfg.decoder, [codes],
        input_is_latent=input_is_latent, z_plus_latent=z_plus_latent,
        noise=noise,
    )
    if resize:
        images = avg_pool(images, cfg.output_size // 256)
    if return_latents:
        return images, codes
    return images


def convert_psp(sd, cfg: PSPConfig):
    """Full pSp checkpoint (encoder.* + decoder.* + latent_avg) → params."""
    from vtoonify_tpu.convert.torch_import import (
        convert_generator,
        convert_psp_encoder,
    )
    import numpy as np

    enc = {k[len("encoder."):]: v for k, v in sd.items()
           if k.startswith("encoder.")}
    dec = {k[len("decoder."):]: v for k, v in sd.items()
           if k.startswith("decoder.")}
    out = {
        "encoder": convert_psp_encoder(enc, cfg.encoder),
        "decoder": convert_generator(dec, cfg.decoder),
    }
    if "latent_avg" in sd:
        out["latent_avg"] = jnp.asarray(np.asarray(sd["latent_avg"]))
    else:
        out["latent_avg"] = jnp.zeros((cfg.n_styles, 512), jnp.float32)
    return out
