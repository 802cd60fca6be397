"""Pallas TPU kernels for the hot render path.

The pure-JAX ops in `nerf_atlas_tpu.ops` are the correctness oracle;
these kernels replace them on the flagship render path:
- `render.fused_render`: encode → density MLP → reflectance MLP →
  transmittance compositing for a whole ray block without touching HBM
  between stages (weights resident in VMEM, activations tiled per block).
"""
from . import render
from .render import fused_plain_cp_render

__all__ = ["render", "fused_plain_cp_render"]
