"""vtoonify_tpu — a TPU-native (JAX/XLA/Pallas) portrait video style-transfer framework.

Re-designed from scratch with the capabilities of VToonify
(SIGGRAPH Asia 2022; reference implementation studied at /root/reference):
controllable high-resolution portrait image/video toonification with
StyleGAN2 / DualStyleGAN backbones, pSp encoders and BiSeNet face parsing.

Design notes (TPU-first, not a port):
  * NHWC layout everywhere; convs ride the MXU via lax.conv_general_dilated.
  * upfirdn2d is ONE dilated/strided depthwise XLA conv (optionally separable),
    not a hand-scheduled CUDA kernel; a Pallas kernel backs the hot fixed cases.
  * Modulated convolutions use the scale-activations formulation (mathematically
    identical to the reference's grouped-conv trick) so batch stays a real batch
    dimension and XLA can tile onto the MXU.
  * Everything is functional: params are pytrees, models are pure apply fns,
    parallelism is jax.sharding Mesh + pjit (DP over frames/batch, optional TP
    over the 512-wide channel dims), not DDP objects.
"""

__version__ = "0.1.0"
