#!/usr/bin/env python3
"""Style-transfer-driven animated 2-D field: a coordinate MLP over (uv, t)
optimized so every frame matches a style image's Gram statistics.

Capability parity: /root/reference/scripts/fieldgan.py (169 LoC); the
reference uses pretrained VGG19 — unavailable offline — so the style
distance runs over a fixed random conv feature stack (StyleLoss).

Usage: python scripts/fieldgan.py --style path/to/img.png
       (defaults to a procedural style target when no image is given)
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
  a.add_argument("--style", default=None, help="style image path")
  a.add_argument("--steps", type=int, default=400)
  a.add_argument("--size", type=int, default=48)
  a.add_argument("--out", default="outputs/fieldgan")
  a.add_argument("-lr", type=float, default=2e-3)
  return a.parse_args()


def main():
  args = arguments()
  os.makedirs(args.out, exist_ok=True)
  from nerf_atlas_tpu.nn import FourierEncoder, SkipConnMLP, StyleLoss

  S = args.size
  if args.style:
    import imageio.v2 as imageio
    import cv2
    style = cv2.resize(np.asarray(imageio.imread(args.style), np.float32)
                       / 255.0, (S, S))[None, ..., :3]
    style = jnp.asarray(style)
  else:  # procedural plaid style
    xs = jnp.linspace(0, 8, S)
    gy, gx = jnp.meshgrid(xs, xs, indexing="ij")
    style = jnp.stack([jnp.sin(gx) ** 2, jnp.sin(gy) ** 2,
                       jnp.sin(gx + gy) ** 2], -1)[None]

  field = SkipConnMLP(in_size=3, out=3,
                      enc=FourierEncoder(input_dims=3, freqs=32, sigma=8.0),
                      num_layers=4, hidden_size=128)
  sloss = StyleLoss(features=(16, 32))

  xs = jnp.linspace(-1, 1, S)
  gy, gx = jnp.meshgrid(xs, xs, indexing="ij")
  uv = jnp.stack([gx, gy], -1)

  fp = field.init(jax.random.PRNGKey(0), jnp.zeros((4, 3)))
  sp = sloss.init(jax.random.PRNGKey(1), style, style)
  opt = optax.adam(args.lr)
  st = opt.init(fp)

  def render(fp, t):
    inp = jnp.concatenate([uv, jnp.full_like(uv[..., :1], t)], -1)
    return jax.nn.sigmoid(field.apply(fp, inp.reshape(-1, 3))
                          ).reshape(1, S, S, 3)

  @jax.jit
  def step(fp, st, key):
    t = jax.random.uniform(key, ())

    def loss_fn(fp):
      img = render(fp, t)
      return sloss.apply(sp, img, style)

    l, g = jax.value_and_grad(loss_fn)(fp)
    up, st2 = opt.update(g, st)
    return optax.apply_updates(fp, up), st2, l

  key = jax.random.PRNGKey(3)
  for i in range(args.steps):
    key, k = jax.random.split(key)
    fp, st, l = step(fp, st, k)
    if (i + 1) % 100 == 0:
      print(f"step {i+1}: style loss {float(l):.6f}")

  import imageio.v2 as imageio
  frames = [
      (np.clip(np.asarray(render(fp, float(t))[0]), 0, 1) * 255
       ).astype(np.uint8)
      for t in np.linspace(0, 1, 12)]
  imageio.mimwrite(os.path.join(args.out, "field.gif"), frames, loop=0)
  print(f"wrote {args.out}/field.gif")


if __name__ == "__main__":
  main()
