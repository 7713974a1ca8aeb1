"""CRIS-TPU: a TPU-native JAX framework for CLIP-driven referring image
segmentation, with the full capabilities of the reference CRIS.pytorch
implementation (CVPR 2022).

The compute path is JAX/XLA/Pallas; parallelism is expressed over a
``jax.sharding.Mesh`` with GSPMD shardings instead of NCCL process groups.

Package layout:
  cris_tpu.utils     -- config system, tokenizer, logging, metering, seeds
  cris_tpu.ops       -- TPU-friendly functional ops (resize, attention,
                        dynamic conv) + Pallas kernels
  cris_tpu.models    -- Flax modules: CLIP encoders, FPN neck, VL decoder,
                        projector, CRIS composition
  cris_tpu.parallel  -- mesh construction and sharding rules (dp x tp)
  cris_tpu.data      -- record/LMDB/synthetic dataset backends, host
                        preprocessing, prefetching loader
  cris_tpu.engine    -- train/validate/inference loops and metrics
  cris_tpu.checkpoint-- orbax save/restore + torch->jax weight converters
"""

__version__ = "0.1.0"
