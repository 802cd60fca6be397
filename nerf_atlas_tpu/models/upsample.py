"""Neural-upsampled rendering: render a low-resolution ray grid through a
canonical model, then neurally upsample to the output resolution
(GIRAFFE-style; reference `--neural-upsample`, runner.py:1195-1204).

Trades per-ray model evaluations for conv FLOPs — on TPU both run on the
MXU, and the 4-16x reduction in ray count dominates.
"""
from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from ..nn import Upsampler
from .base import NeRFBase


class NeuralUpsampled(NeRFBase):
  """Wraps a canonical model; consumes a LOW-res image grid of rays
  [..., h, w, 6] and emits [..., H, W, 3]."""
  canonical_kind: str = "plain"
  canonical_kwargs: Any = None
  low_res: int = 16
  out_res: int = 64
  feats: int = 32

  def setup(self):
    from . import MODEL_KINDS
    kwargs = dict(self.canonical_kwargs or {})
    kwargs.setdefault("steps", self.steps)
    kwargs.setdefault("t_near", self.t_near)
    kwargs.setdefault("t_far", self.t_far)
    kwargs.setdefault("sky_kind", self.sky_kind)
    self.canonical = MODEL_KINDS[self.canonical_kind](**kwargs)
    self.upsampler = Upsampler(in_size=self.low_res, out_size=self.out_res,
                               feats=self.feats, dtype=self.dtype,
                               name="upsampler")

  def __call__(self, rays, times=None, latents=None, train: bool = False):
    assert rays.shape[-3] == self.low_res and rays.shape[-2] == self.low_res
    batch = rays.shape[:-3]
    flat = rays.reshape((-1, 6))
    t_flat = None
    if times is not None:
      t_flat = jnp.repeat(times.reshape(-1), self.low_res * self.low_res)
    out = self.canonical(flat, times=t_flat, train=train)
    img_lo = out["rgb"].reshape(batch + (self.low_res, self.low_res, 3))
    img4 = img_lo.reshape((-1, self.low_res, self.low_res, 3))
    up = self.upsampler(img4)
    up = jnp.clip(up, 0.0, 1.0)
    return dict(rgb=up.reshape(batch + (self.out_res, self.out_res, 3)),
                rgb_low=img_lo, weights=out["weights"], ts=out["ts"])
