"""Fused render megakernel for the flagship PlainNeRF-CP model.

One `pallas_call` per ray block does the ENTIRE forward render:
  ray → T sample points → CP factorized-volume encode (hat-basis matmul)
  → density MLP (skip-connected, bf16 on the MXU) → view-reflectance MLP
  → softplus density → alpha → exclusive-transmittance compositing →
  composited RGB + accumulated alpha.

Why fused: the XLA path materializes every [N·T, C] activation in HBM
(~10 tensors × 8.4M points); this kernel keeps all of it in VMEM per
block — weights are small (≈1 MB) and stay resident, so the kernel is
MXU-bound instead of HBM-bound.

TPU specifics:
  * points are laid out ray-major ([B rays × T samples] flattened) so the
    per-ray transmittance scan is a reshape to [B, T] with T in lanes;
  * the exclusive prefix-sum over log-transmittance is a strictly-lower-
    triangular matmul on the MXU (log-space product scan);
  * output is [B, 4] (rgb ‖ acc) per block.

The pure-JAX model (`models.PlainNeRF(enc_kind="cp")`) is the oracle;
`tests/test_pallas_render.py` checks parity in interpret mode.
"""
from __future__ import annotations

import functools
import math
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# flagship architecture constants (must match models.PlainNeRF defaults)
CP_RESOLUTIONS = (16, 32, 64, 128)
CP_RANK = 8
ENC_DIM = len(CP_RESOLUTIONS) * CP_RANK          # 32
IN_DIM = 3
FEAT_IN = ENC_DIM                                 # density MLP input
HIDDEN = 256
N_LAYERS = 5
SKIP = 3
INTERMEDIATE = 32
R_HIDDEN = 128
R_LAYERS = 5

DEFAULT_BLOCK_RAYS = 64


def _dot(a, b):
  return jax.lax.dot_general(
      a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
      dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)


def _leaky_relu(x):
  return jnp.where(x >= 0, x, 0.01 * x).astype(jnp.bfloat16)


def _thin_sigmoid(v, eps: float = 1e-2):
  fat = jax.nn.sigmoid(v) * (1 - 2 * eps) - (-eps)
  return fat + eps


def _render_kernel(rays_ref, elaz_ref, *refs, steps, t_near, t_far,
                   block_rays):
  """refs: [w list..., out_ref]. Weight order produced by `_flatten_params`.
  elaz_ref: per-ray (elev, azim) of the view direction, precomputed outside
  the kernel (Mosaic has no acos/atan2 primitives)."""
  out_ref = refs[-1]
  wrefs = refs[:-1]
  widx = [0]

  def next_w():
    r = wrefs[widx[0]]
    widx[0] += 1
    return r

  B, T = block_rays, steps
  P = B * T

  rays = rays_ref[:, :]                         # [B, 6] f32 (lane-padded)
  r_o = rays[:, 0:3]
  r_d = rays[:, 3:6]

  # sample points, ray-major: t varies fastest
  ts = t_near + (t_far - t_near) * (
      jax.lax.broadcasted_iota(jnp.int32, (1, T), 1).astype(jnp.float32)
      / (T - 1))                                                   # [1, T]
  # pts [B, T, 3] -> [P, 3]
  pts = (r_o[:, None, :] + ts[0][None, :, None] * r_d[:, None, :]
         ).reshape(P, 3)

  # ---- CP encoder ----
  # (A packed block-diagonal single-matmul variant was measured neutral at
  # best and costs the VMEM that lets BR=64 fit — per-level thin dots win.)
  xn = jnp.clip((pts + 1.0) * 0.5, 0.0, 1.0)    # bbox [-1, 1]
  enc_parts = []
  for R in CP_RESOLUTIONS:
    lines = next_w()[...]                       # [3, R, K]
    level = None
    centers = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1).astype(
        jnp.float32)
    for axis in range(3):
      v = xn[:, axis:axis + 1] * (R - 1)        # [P, 1]
      w = jnp.maximum(1.0 - jnp.abs(v - centers), 0.0)  # [P, R]
      f = _dot(w, lines[axis])                  # [P, K]
      level = f if level is None else level * f
    enc_parts.append(level)
  enc = jnp.concatenate(enc_parts, axis=-1)     # [P, 32]

  # ---- density MLP (SkipConnMLP: layer_in, layer_0..4, layer_out) ----
  def dense(h):
    w = next_w()[...]
    b = next_w()[...]
    return _dot(h, w) + b[0]

  init_feat = enc
  h = _leaky_relu(dense(init_feat))
  for i in range(N_LAYERS):
    if i % SKIP == 0 and i > 0:
      h = jnp.concatenate([h, init_feat], axis=-1)
    h = _leaky_relu(dense(h))
  first_out = dense(h)                          # [P, 1 + 32]
  density = first_out[:, 0:1]                   # [P, 1]
  feats = first_out[:, 1:1 + INTERMEDIATE]

  # ---- reflectance MLP (View, siren): input (pts ‖ elaz) + latent ----
  elaz = elaz_ref[:, 0:2]                       # [B, 2] precomputed
  elaz_p = jnp.broadcast_to(elaz[:, None, :], (B, T, 2)).reshape(P, 2)
  r_in = jnp.concatenate([pts, elaz_p, feats], axis=-1)  # [P, 5+32]

  def sin_act(x):
    return jnp.sin(30.0 * x).astype(jnp.bfloat16)

  h = sin_act(dense(r_in))
  for i in range(R_LAYERS):
    if i % SKIP == 0 and i > 0:
      h = jnp.concatenate([h, r_in], axis=-1)
    h = sin_act(dense(h))
  rgb_raw = dense(h)                            # [P, 3]
  rgb = _thin_sigmoid(rgb_raw)

  # ---- compositing (matches ops.integrate.alpha_from_density) ----
  sigma = jax.nn.softplus(density - 1.0)        # [P, 1]
  d_bt = sigma.reshape(B, T)
  dt = max((t_far - t_near) / (T - 1), 1e-5)
  rd_norm = jnp.sqrt(jnp.sum(r_d * r_d, axis=-1, keepdims=True))  # [B, 1]
  col_t = jax.lax.broadcasted_iota(jnp.int32, (1, T), 1)
  dists = jnp.where(col_t == T - 1, 1e10, dt) * rd_norm           # [B, T]
  alpha = 1.0 - jnp.exp(-d_bt * dists)          # [B, T]
  log_t = jnp.log(jnp.maximum(1.0 - alpha + 1e-10, 1e-30))
  # exclusive prefix sum along T as a strictly-lower-triangular matmul
  row = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
  col = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
  lower = (row < col).astype(jnp.float32)       # L[j, i] = 1 if j < i
  excl = jax.lax.dot_general(
      log_t, lower, dimension_numbers=(((1,), (0,)), ((), ())),
      preferred_element_type=jnp.float32)       # [B, T]
  weights = alpha * jnp.exp(excl)

  # per-channel weighted sum along T (avoids a [B, T, 3] VMEM tensor)
  for c in range(3):
    rc = rgb[:, c:c + 1].reshape(B, T)
    out_ref[:, c:c + 1] = jnp.sum(weights * rc, axis=-1, keepdims=True)
  out_ref[:, 3:4] = jnp.sum(weights, axis=-1, keepdims=True)


def _flatten_params(params) -> Sequence[jnp.ndarray]:
  """Flagship param pytree -> flat weight list in kernel consumption order."""
  p = params["params"]
  dm = p["density_mlp"]
  rm = p["refl"]["mlp"]
  ws = []
  for li in range(len(CP_RESOLUTIONS)):
    ws.append(dm["enc"][f"lines_{li}"])
  def add(layer):
    ws.append(layer["kernel"])
    ws.append(layer["bias"][None, :])  # [1, C] (2-D for TPU)
  add(dm["layer_in"])
  for i in range(N_LAYERS):
    add(dm[f"layer_{i}"])
  add(dm["layer_out"])
  add(rm["layer_in"])
  for i in range(R_LAYERS):
    add(rm[f"layer_{i}"])
  add(rm["layer_out"])
  return ws


@functools.partial(jax.jit, static_argnames=("steps", "t_near", "t_far",
                                             "block_rays", "interpret"))
def fused_plain_cp_render(params, rays, *, steps: int = 64,
                          t_near: float = 2.0, t_far: float = 6.0,
                          block_rays: int = DEFAULT_BLOCK_RAYS,
                          interpret: bool = False):
  """Render rays [N, 6] -> [N, 4] (rgb ‖ acc) with the fused kernel.

  params: the flax params of models.PlainNeRF(enc_kind="cp") with default
  architecture sizes. N must be a multiple of block_rays (the driver pads).
  """
  N = rays.shape[0]
  assert N % block_rays == 0, (N, block_rays)
  # pre-cast matmul weights to bf16 on the host: casting 256x256 kernels
  # inside every grid program costs more VPU time than the matmuls save
  ws = [w.astype(jnp.bfloat16) if w.ndim >= 2 and w.shape[0] > 1 else w
        for w in _flatten_params(params)]

  from ...ops.math import dir_to_elev_azim
  elaz = dir_to_elev_azim(rays[:, 3:6])          # [N, 2] host-side math

  kernel = functools.partial(_render_kernel, steps=steps, t_near=t_near,
                             t_far=t_far, block_rays=block_rays)
  grid = (N // block_rays,)
  in_specs = [pl.BlockSpec((block_rays, 6), lambda i: (i, 0),
                           memory_space=pltpu.VMEM),
              pl.BlockSpec((block_rays, 2), lambda i: (i, 0),
                           memory_space=pltpu.VMEM)]
  for w in ws:
    in_specs.append(pl.BlockSpec(
        w.shape, lambda i, nd=w.ndim: (0,) * nd,
        memory_space=pltpu.VMEM))
  out_spec = pl.BlockSpec((block_rays, 4), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
  return pl.pallas_call(
      kernel,
      grid=grid,
      in_specs=in_specs,
      out_specs=out_spec,
      out_shape=jax.ShapeDtypeStruct((N, 4), jnp.float32),
      interpret=interpret,
  )(rays, elaz, *ws)
