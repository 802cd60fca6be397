"""Ray sampling: stratified / linear-in-disparity t values and sample points.

TPU-first wire format (differs from the reference's [T,B,H,W,*] layout,
reference src/nerf.py:29-55): rays are `[..., 6]` (origin ‖ direction) with an
arbitrary batch shape — typically flat `[N, 6]` tiles sharded over the data
mesh axis — and sample points are `[..., T, 3]` with the sample axis
second-to-last. Keeping T innermost-but-one means per-ray scans (transmittance)
are contiguous and the MLP flattens [..., T] into one big MXU batch.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def split_rays(rays) -> Tuple[jnp.ndarray, jnp.ndarray]:
  """rays [..., 6] -> (r_o [..., 3], r_d [..., 3])."""
  return rays[..., :3], rays[..., 3:6]


def compute_ts(
    near: float,
    far: float,
    steps: int,
    *,
    lindisp: bool = False,
    perturb: float = 0.0,
    key: Optional[jax.Array] = None,
    dtype=jnp.float32,
    batch_shape: Tuple[int, ...] = (),
) -> jnp.ndarray:
  """t values along a ray: linear in t, or linear in disparity.

  With `perturb > 0` draws stratified-jittered samples inside the bins
  defined by the midpoints (reference src/nerf.py:40-46). `batch_shape=()`
  gives a single shared jitter across all rays (the reference's behavior —
  its ts tensor is 1-D); pass the ray batch shape for independent per-ray
  stratification (better, available under --per-ray-jitter).

  Returns ts of shape batch_shape + [steps].
  """
  if lindisp:
    t_vals = jnp.linspace(0.0, 1.0, steps, dtype=dtype)
    ts = 1.0 / (1.0 / max(near, 1e-10) * (1 - t_vals) + 1.0 / far * t_vals)
  else:
    ts = jnp.linspace(near, far, steps, dtype=dtype)

  if perturb > 0:
    assert key is not None, "stratified perturbation requires a PRNG key"
    mids = 0.5 * (ts[:-1] + ts[1:])
    lower = jnp.concatenate([mids, ts[-1:]])
    upper = jnp.concatenate([ts[:1], mids])
    rand = jax.random.uniform(key, batch_shape + (steps,), dtype=dtype) * perturb
    ts = lower + (upper - lower) * rand
  elif batch_shape:
    ts = jnp.broadcast_to(ts, batch_shape + (steps,))
  return ts


def compute_pts(rays, ts) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
  """Sample points along rays.

  rays: [..., 6]; ts: [T] or [..., T].
  Returns (pts [..., T, 3], r_o [..., 3], r_d [..., 3]).
  """
  r_o, r_d = split_rays(rays)
  if ts.ndim == 1:
    pts = r_o[..., None, :] + ts[:, None] * r_d[..., None, :]
  else:
    pts = r_o[..., None, :] + ts[..., :, None] * r_d[..., None, :]
  return pts, r_o, r_d


def compute_pts_ts(
    rays,
    near: float,
    far: float,
    steps: int,
    *,
    lindisp: bool = False,
    perturb: float = 0.0,
    key: Optional[jax.Array] = None,
    per_ray_jitter: bool = False,
):
  """Fused `compute_ts` + point generation (reference src/nerf.py:50-55).

  Returns (pts [..., T, 3], ts, r_o, r_d).
  """
  batch_shape = rays.shape[:-1] if (per_ray_jitter and perturb > 0) else ()
  ts = compute_ts(near, far, steps, lindisp=lindisp, perturb=perturb, key=key,
                  dtype=rays.dtype, batch_shape=batch_shape)
  pts, r_o, r_d = compute_pts(rays, ts)
  return pts, ts, r_o, r_d
