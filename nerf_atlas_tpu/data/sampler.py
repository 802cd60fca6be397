"""Device-resident ray batch sampling.

The reference trains on random per-view crops indexed out of CPU tensors
each step (runner.py:625-661, one H2D copy per step). TPU-first redesign:
labels live on device once; every step draws a uniform random batch of
(view, x, y) pixel indices inside jit, gathers the pixel colors, and
generates the rays from the camera pytree — zero host↔device traffic in
the step loop and a single static batch shape, which is also the shape we
shard over the data mesh axis.

Crop sampling (contiguous tiles) is kept for models that need image
neighborhoods (upsampler, style losses).
"""
from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class RayDataset:
  """Device-resident labels + camera (+ lights); jit-safe sampling."""
  pixels: jnp.ndarray                      # [N, S, S, C]
  camera: Any                              # camera pytree
  times: Optional[jnp.ndarray] = None      # [N] or None
  lights: Optional[Any] = None             # light pytree (refl.lights.Point)
  size: int = struct.field(pytree_node=False, default=256)

  @classmethod
  def from_bundle(cls, bundle, size: int):
    labels = bundle.labels
    times = None
    if isinstance(labels, tuple):
      labels, times = labels
      times = jnp.asarray(times)
    lights = getattr(bundle, "lights", None)
    if isinstance(lights, dict):
      # loader contract: {"positions": [N, L, 3], "intensity": scalar|[L,C]}
      # (e.g. nerv_point) -> a Point light pytree
      from ..refl import lights as lights_lib
      lights = lights_lib.Point.make(lights["positions"],
                                     lights.get("intensity", 100.0))
    return cls(pixels=jnp.asarray(labels), camera=bundle.camera,
               times=times, lights=lights, size=size)

  @property
  def num_views(self) -> int:
    return self.pixels.shape[0]

  def sample(self, key, batch_size: int, jitter: float = 0.0,
             view_range: Optional[Tuple[int, int]] = None,
             serial_step=None, end_bias: int = 0):
    """Uniform random rays over all views and pixels.

    view_range=(lo, hi) restricts sampling to views [lo, hi) — used by
    progressive long-video training to train one time window at a time.
    serial_step: traced step index — train views in serial
    (view = step % N, the reference's --serial-idxs, runner.py:637).
    end_bias: >0 adds `end_bias` extra draws each of the first and last
    view to the choice pool (--higher-end-chance, runner.py:632-635).
    Returns (rays [B, 6], pix [B, C], times [B] | None, view [B] int32)
    — `view` feeds per-view light selection for relightable models.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    n, s = self.num_views, self.size
    lo, hi = view_range if view_range is not None else (0, n)
    if serial_step is not None:
      view = jnp.full((batch_size,), serial_step % n, jnp.int32)
    elif end_bias > 0:
      u = jax.random.randint(k1, (batch_size,), lo, hi + 2 * end_bias)
      view = jnp.where(u < hi, u,
                       jnp.where(u < hi + end_bias, lo, hi - 1))
    else:
      view = jax.random.randint(k1, (batch_size,), lo, hi)
    xy = jax.random.randint(k2, (batch_size, 2), 0, s)
    pix = self.pixels[view, xy[:, 1], xy[:, 0]]
    rays = self.camera.rays_at(view, (xy + 0.5).astype(jnp.float32), s,
                               jitter=jitter, key=k3)
    t = None if self.times is None else self.times[view]
    return rays, pix, t, view

  def sample_rays(self, key, batch_size: int, jitter: float = 0.0,
                  view_range: Optional[Tuple[int, int]] = None):
    """`sample` without the view indices (legacy 3-tuple form)."""
    rays, pix, t, _ = self.sample(key, batch_size, jitter, view_range)
    return rays, pix, t

  def sample_crop(self, key, crop_size: int, views_per_batch: int = 1,
                  jitter: float = 0.0):
    """Random contiguous crop from random views (reference semantics;
    feeds image-structured losses: ssim / fft / style).

    Returns (rays [V, c, c, 6], pix [V, c, c, C], times [V] | None,
    view [V] int32).
    """
    k1, k2, k3 = jax.random.split(key, 3)
    n, s, c = self.num_views, self.size, crop_size
    view = jax.random.randint(k1, (views_per_batch,), 0, n)
    tl = jax.random.randint(k2, (views_per_batch, 2), 0, max(s - c, 1))
    grid = jnp.stack(jnp.meshgrid(jnp.arange(c), jnp.arange(c),
                                  indexing="xy"), axis=-1)     # [c, c, 2]
    xy = tl[:, None, None, :] + grid[None]                     # [V, c, c, 2]
    pix = self.pixels[view[:, None, None], xy[..., 1], xy[..., 0]]
    vidx = view[:, None, None]
    rays = self.camera.rays_at(vidx, (xy + 0.5).astype(jnp.float32), s,
                               jitter=jitter, key=k3)
    t = None if self.times is None else self.times[view]
    return rays, pix, t, view

  def view_rays(self, view, render_size: Optional[int] = None):
    """All rays of one view at `render_size` (default: dataset size),
    flattened to [render_size**2, 6] — for tiled eval rendering.
    `view` may be a traced int (jit-safe)."""
    rs = render_size or self.size
    scale = self.size / rs
    xs = (jnp.arange(rs, dtype=jnp.float32) + 0.5) * scale
    gy, gx = jnp.meshgrid(xs, xs, indexing="ij")
    xy = jnp.stack([gx, gy], axis=-1)
    vidx = jnp.full(xy.shape[:-1], view, jnp.int32)
    rays = self.camera.rays_at(vidx, xy, self.size)
    return rays.reshape(-1, 6)
