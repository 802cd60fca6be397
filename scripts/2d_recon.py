#!/usr/bin/env python3
"""2-D image animation via Bezier splines over time — the 2-D testbed for
Spline-NeRF dynamics.

Capability parity: /root/reference/scripts/2d_recon.py (280 LoC): image
models (pixel MLP / LIIF-ish latent) animated by Long (segmented) or
Simple Bezier warps, trained against procedurally animated targets.

Usage: python scripts/2d_recon.py --steps 800 --out outputs/2d_recon
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax


def arguments():
  a = argparse.ArgumentParser()
  a.add_argument("--steps", type=int, default=600)
  a.add_argument("--size", type=int, default=48)
  a.add_argument("--spline", type=int, default=4)
  a.add_argument("--segments", type=int, default=1,
                 help=">1 uses the Long (poly-Bezier) animator")
  a.add_argument("--out", default="outputs/2d_recon")
  a.add_argument("-lr", type=float, default=2e-3)
  return a.parse_args()


def target_frame(uv, t):
  """Animated 2-D scene: a disc orbiting the center."""
  c = 0.45 * jnp.stack([jnp.cos(2 * jnp.pi * t), jnp.sin(2 * jnp.pi * t)])
  d = jnp.linalg.norm(uv - c, axis=-1)
  disc = jax.nn.sigmoid((0.18 - d) * 80)
  bg = 0.15 + 0.1 * jnp.sin(4 * uv[..., 0])
  return jnp.stack([disc, bg * (1 - disc), 0.3 * (1 - disc)], -1)


def main():
  args = arguments()
  os.makedirs(args.out, exist_ok=True)
  from nerf_atlas_tpu.nn import FourierEncoder, SkipConnMLP
  from nerf_atlas_tpu.ops import bezier

  S = args.size
  xs = jnp.linspace(-1, 1, S)
  gy, gx = jnp.meshgrid(xs, xs, indexing="ij")
  uv = jnp.stack([gx, gy], -1).reshape(-1, 2)

  img_mlp = SkipConnMLP(in_size=2, out=3,
                        enc=FourierEncoder(input_dims=2, freqs=32, sigma=8.0),
                        num_layers=4, hidden_size=128)
  n_ctrl = args.spline
  warp = SkipConnMLP(in_size=2, out=2 * (n_ctrl - 1) * args.segments,
                     enc=FourierEncoder(input_dims=2, freqs=16, sigma=4.0),
                     num_layers=4, hidden_size=128, zero_last=True)

  ip = img_mlp.init(jax.random.PRNGKey(0), uv)
  wp = warp.init(jax.random.PRNGKey(1), uv)
  params = {"img": ip, "warp": wp}
  opt = optax.adam(args.lr)
  st = opt.init(params)

  def delta(params, uv, t):
    raw = warp.apply(params["warp"], uv).reshape(
        uv.shape[0], args.segments, n_ctrl - 1, 2)
    seg = jnp.clip((t * args.segments).astype(jnp.int32), 0,
                   args.segments - 1)
    local_t = t * args.segments - seg
    ctrl = jnp.take_along_axis(raw, seg[:, None, None, None], axis=1)[:, 0]
    ctrl = jnp.concatenate([jnp.zeros_like(ctrl[:, :1]), ctrl], axis=1)
    ctrl = jnp.moveaxis(ctrl, 1, 0)
    return bezier.de_casteljau(ctrl, local_t[:, None], n_ctrl)

  def render(params, t):
    tt = jnp.full((uv.shape[0],), t)
    dp = delta(params, uv, tt)
    return img_mlp.apply(params["img"], uv + dp)

  @jax.jit
  def step(params, st, key):
    t = jax.random.uniform(key, ())

    def loss_fn(p):
      pred = render(p, t)
      ref = target_frame(uv, t)
      return jnp.mean((pred - ref) ** 2)

    l, g = jax.value_and_grad(loss_fn)(params)
    up, st2 = opt.update(g, st)
    return optax.apply_updates(params, up), st2, l

  key = jax.random.PRNGKey(7)
  for i in range(args.steps):
    key, k = jax.random.split(key)
    params, st, l = step(params, st, k)
    if (i + 1) % 100 == 0:
      print(f"step {i+1}: loss {float(l):.5f}")

  import imageio.v2 as imageio
  frames = []
  for t in np.linspace(0, 1, 16):
    img = np.asarray(render(params, float(t))).reshape(S, S, 3)
    frames.append((np.clip(img, 0, 1) * 255).astype(np.uint8))
  imageio.mimwrite(os.path.join(args.out, "anim.gif"), frames, loop=0)
  print(f"wrote {args.out}/anim.gif (final loss {float(l):.5f})")


if __name__ == "__main__":
  main()
