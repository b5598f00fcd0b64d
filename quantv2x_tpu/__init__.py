"""QuantV2X-TPU: a TPU-native fully-quantized cooperative-perception framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ucla-mobility/QuantV2X (multi-agent V2X cooperative 3D detection with an
INT8 PTQ inference path and a learned-codebook BEV compressor).

Design principles (TPU-first, see SURVEY.md):
  - static shapes everywhere: voxels / agents / boxes are padded + masked
  - NHWC layout, bfloat16 compute, fp32 accumulation on the MXU
  - jit-compatible control flow (lax.scan / lax.cond / masking)
  - multi-chip scaling via jax.sharding.Mesh + NamedSharding, not NCCL
  - real INT8 execution via Pallas fused dequant->matmul->requant kernels
"""

__version__ = "0.1.0"
