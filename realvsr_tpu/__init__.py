"""realvsr_tpu — a TPU-native (JAX/XLA/Pallas/pjit) video super-resolution framework.

A from-scratch rebuild of the capabilities of IanYeung/RealVSR (ICCV 2021):
multi-frame real-world video super-resolution with YCbCr decomposition
learning, Laplacian-pyramid losses, deformable-convolution alignment (EDVR /
TDAN), optical-flow alignment (TOF/SpyNet), 3D-conv (FSTRN) and channel
attention (RCAN) generator families, pyramid GAN discriminators, and the full
train / eval / data / config stack.

Design notes (TPU-first, not a port):
  * channels-last (NHWC) layout everywhere; video batches are [B, T, H, W, C].
  * models are pure flax.linen modules; a single jitted train step.
  * the DCNv2 CUDA extension of the reference is replaced by an XLA
    gather+GEMM formulation plus a fused Pallas TPU kernel (ops/deform_conv).
  * parallelism via jax.sharding.Mesh + NamedSharding; XLA inserts the
    collectives (no NCCL translation).
"""

__version__ = "0.1.0"
