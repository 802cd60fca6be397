"""SDF ray intersection: sphere marching, dense-scan + bisection, secant.

Capability parity: /root/reference/src/march.py:12-203. All functions
return `(pts, hits, dist, throughput)`; `throughput` is the minimum SDF
value along the ray, differentiable w.r.t. the SDF (the silhouette/miss
signal used for masked training).

TPU-first redesign (the reference's loops are latency-bound and use boolean
compaction, which is hostile to XLA's static shapes):
  * the fixed-step scan that finds the minimum SDF and the first sign
    change evaluates ALL steps in ONE batched SDF call ([..., S, 3] ->
    [..., S]) — a single MXU-sized batch — then reduces along S with
    argmin / first-true, instead of stepping sequentially;
  * bisection/secant refinement is a fixed-iteration `lax.fori_loop` over
    dense masked tensors (no compaction; inactive lanes are simply masked).

`sdf_fn` maps points [..., 3] -> sdf values [...].
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional

import jax
import jax.numpy as jnp


def throughput_with_sign_change(
    sdf_fn: Callable,
    r_o, r_d,
    near: float, far: float,
    batch_size: int = 128,
    key: Optional[jax.Array] = None,
):
  """Dense scan along each ray.

  Returns (tput [...], best_pos [..., 3], t_lo [...], t_hi [...], hits [...]).
  tput is sdf(argmin point) evaluated WITH gradient; the scan itself is
  stop-gradiented (matches the reference's no_grad scan + grad final eval).
  (t_lo, t_hi) bracket the first sign change; where there is none they
  collapse to the far end (bisection then becomes a no-op under its mask).
  """
  max_t = far - near
  if key is not None:  # the reference jitters the scan extent slightly
    max_t = max_t + jax.random.uniform(key, ()) * (2.0 / batch_size)
  step = max_t / batch_size
  ts = near + step * jnp.arange(1, batch_size + 1, dtype=r_o.dtype)  # [S]

  pts = r_o[..., None, :] + ts[:, None] * r_d[..., None, :]  # [..., S, 3]
  sd0 = sdf_fn(r_o + near * r_d)  # [...]
  sd = sdf_fn(jax.lax.stop_gradient(pts))  # [..., S]
  all_sd = jnp.concatenate([sd0[..., None], sd], axis=-1)  # [..., S+1]
  all_ts = jnp.concatenate(
      [jnp.full_like(ts[:1], near), ts], axis=0)  # [S+1]

  best_idx = jnp.argmin(all_sd, axis=-1)  # [...]
  best_t = all_ts[best_idx]
  best_pos = r_o + best_t[..., None] * r_d

  neg = all_sd < 0
  hits = jnp.any(neg, axis=-1)
  first_neg = jnp.argmax(neg, axis=-1)  # first True; 0 if none
  first_neg = jnp.where(hits, first_neg, all_sd.shape[-1] - 1)
  last_pos = jnp.maximum(first_neg - 1, 0)
  t_lo = all_ts[last_pos]
  t_hi = all_ts[first_neg]

  tput = sdf_fn(best_pos)  # differentiable path
  return tput, best_pos, t_lo, t_hi, hits


def throughput(sdf_fn, r_o, r_d, near: float, far: float,
               batch_size: int = 128, key=None):
  """Min-SDF along the ray + its position (reference src/march.py:182-203)."""
  tput, best_pos, _, _, _ = throughput_with_sign_change(
      sdf_fn, r_o, r_d, near, far, batch_size, key)
  return tput, best_pos


def bisection(sdf_fn, r_o, r_d, t_lo, t_hi, iters: int = 32, eps: float = 1e-6):
  """Masked bisection inside [t_lo, t_hi] (assumes sdf(t_lo)>0>sdf(t_hi)
  where active). Returns intersection points [..., 3]."""
  def at(t):
    return r_o + t[..., None] * r_d

  sdf_lo = jax.lax.stop_gradient(sdf_fn(at(t_lo)))
  sdf_hi = jax.lax.stop_gradient(sdf_fn(at(t_hi)))

  def body(_, carry):
    lo, hi, s_lo, s_hi = carry
    active = ((hi - lo) > eps) & (s_lo > 0) & (s_hi < 0)
    mid = (lo + hi) / 2
    s_mid = jax.lax.stop_gradient(sdf_fn(at(mid)))
    go_lo = active & (s_mid > 0)
    go_hi = active & (s_mid < 0)
    lo = jnp.where(go_lo, mid, lo)
    s_lo = jnp.where(go_lo, s_mid, s_lo)
    hi = jnp.where(go_hi, mid, hi)
    s_hi = jnp.where(go_hi, s_mid, s_hi)
    return lo, hi, s_lo, s_hi

  lo, hi, _, _ = jax.lax.fori_loop(0, iters, body, (t_lo, t_hi, sdf_lo, sdf_hi))
  return at((lo + hi) / 2)


def secant_find(sdf_fn, r_o, r_d, t_lo, t_hi, iters: int = 32):
  """Masked secant refinement (IDR-style), safeguarded to stay in-bracket."""
  def at(t):
    return r_o + t[..., None] * r_d

  s_lo = jax.lax.stop_gradient(sdf_fn(at(t_lo)))
  s_hi = jax.lax.stop_gradient(sdf_fn(at(t_hi)))

  def z_pred_fn(lo, hi, sl, sh):
    denom = sh - sl
    denom = jnp.where(jnp.abs(denom) < 1e-10, 1.0, denom)
    z = -sl * (hi - lo) / denom + lo
    return jnp.clip(z, jnp.minimum(lo, hi), jnp.maximum(lo, hi))

  def body(_, carry):
    lo, hi, sl, sh = carry
    z = z_pred_fn(lo, hi, sl, sh)
    s_mid = jax.lax.stop_gradient(sdf_fn(at(z)))
    go_lo = s_mid > 0
    go_hi = s_mid < 0
    lo = jnp.where(go_lo, z, lo)
    sl = jnp.where(go_lo, s_mid, sl)
    hi = jnp.where(go_hi, z, hi)
    sh = jnp.where(go_hi, s_mid, sh)
    return lo, hi, sl, sh

  lo, hi, sl, sh = jax.lax.fori_loop(0, iters, body, (t_lo, t_hi, s_lo, s_hi))
  return at(z_pred_fn(lo, hi, sl, sh))


def sphere_march(
    sdf_fn, r_o, r_d,
    iters: int = 32, eps: float = 1e-3,
    near: float = 0.0, far: float = 1.0,
):
  """Classic sphere marching as a fixed-iteration masked loop.

  Returns (pts [..., 3], hits [...], dist [..., 1], None).
  """
  batch = r_o.shape[:-1]
  init = (
      jnp.full(batch, near, r_o.dtype),       # current t
      jnp.zeros(batch, bool),                  # hit
      jnp.ones(batch, bool),                   # remaining (still marching)
  )

  def body(_, carry):
    t, hit, rem = carry
    curr = r_o + t[..., None] * r_d
    d = jax.lax.stop_gradient(sdf_fn(curr))
    new_hit = hit | (rem & (d < eps) & (t <= far))
    t = jnp.where(rem, t + d, t)
    rem = rem & ~new_hit & (t <= far)
    return t, new_hit, rem

  t, hits, _ = jax.lax.fori_loop(0, iters, body, init)
  pts = r_o + t[..., None] * r_d
  return pts, hits, t[..., None], None


def bisect(sdf_fn, r_o, r_d, iters: int = 128, eps: float = 0.0,
           near: float = 0.0, far: float = 1.0, key=None):
  """Dense scan + bisection refinement (the reference's default intersector,
  src/march.py:63-75). Returns (pts, hits, best_pos, throughput[..., 1])."""
  del eps
  tput, best_pos, t_lo, t_hi, hits = throughput_with_sign_change(
      sdf_fn, r_o, r_d, near, far, batch_size=iters, key=key)
  pts = bisection(sdf_fn, r_o, r_d, t_lo, t_hi, iters=min(32, iters))
  return pts, hits, best_pos, tput[..., None]


def secant(sdf_fn, r_o, r_d, iters: int = 128, eps: float = 1e-3,
           near: float = 0.0, far: float = 1.0, key=None):
  """Dense scan + secant refinement. Returns (pts, hits, best_pos, tput)."""
  del eps
  tput, best_pos, t_lo, t_hi, hits = throughput_with_sign_change(
      sdf_fn, r_o, r_d, near, far, batch_size=iters, key=key)
  pts = secant_find(sdf_fn, r_o, r_d, t_lo, t_hi, iters=iters)
  return pts, hits, best_pos, tput


INTERSECTION_KINDS = {
    "sphere": sphere_march,
    "secant": secant,
    "bisect": bisect,
}


def load_intersection_kind(kind: str):
  fn = INTERSECTION_KINDS.get(kind)
  if fn is None:
    raise NotImplementedError(f"unknown intersection kind {kind}")
  return fn
