#!/usr/bin/env python3
"""Visualize a trained Rusin BRDF over the (θ_h, θ_d, φ_d) grid.

Capability parity: /root/reference/scripts/eval_rusin.py (57 LoC).
Loads a checkpoint whose reflectance is `rusin` (or runs a fresh-init one
with --random) and writes φ_d slices as an image grid.
"""
from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def arguments():
  a = argparse.ArgumentParser()
  a.add_argument("--load", default=None, help="checkpoint with rusin refl")
  a.add_argument("--random", action="store_true", help="fresh random BRDF")
  a.add_argument("--res", type=int, default=64)
  a.add_argument("--slices", type=int, default=4)
  a.add_argument("--out", default="outputs/rusin_eval.png")
  return a.parse_args()


def main():
  args = arguments()
  from nerf_atlas_tpu.refl import load_refl
  from nerf_atlas_tpu.refl.brdf import Rusin

  refl = load_refl("rusin")
  x = jnp.zeros((4, 3))
  v = jnp.array([[0.0, 0, -1.0]] * 4)
  n = jnp.array([[0.0, 0, 1.0]] * 4)
  l = jnp.array([[0.0, 0, 1.0]] * 4)
  params = refl.init(jax.random.PRNGKey(0), x, view=v, normal=n, light=l)
  if args.load:
    from nerf_atlas_tpu.train import checkpoints
    raw = checkpoints.load(args.load)
    saved = raw.get("params", raw)
    # find a rusin subtree anywhere in the checkpoint
    def find(tree):
      if isinstance(tree, dict):
        if "brdf" in tree:
          return {"params": tree}
        for vv in tree.values():
          r = find(vv)
          if r is not None:
            return r
      return None
    sub = find(saved)
    if sub is not None:
      params, _, _ = checkpoints.graft(params, sub)
      print("grafted rusin params from checkpoint")

  R = args.res
  th = jnp.linspace(0, math.pi / 2, R)
  td = jnp.linspace(0, math.pi / 2, R)
  gh, gd = jnp.meshgrid(th, td, indexing="ij")

  # evaluate the inner MLP directly on rusin coordinates
  rows = []
  mlp_params = {"params": params["params"]["brdf"]}
  from nerf_atlas_tpu.nn import SkipConnMLP
  mlp = SkipConnMLP(in_size=6, out=3, latent_size=0, num_layers=5,
                    hidden_size=128)
  for i in range(args.slices):
    pd = math.pi * i / max(args.slices - 1, 1)
    coords = jnp.stack([gh, gd, jnp.full_like(gh, pd)], -1).reshape(-1, 3)
    inp = jnp.concatenate([coords, jnp.zeros((coords.shape[0], 3))], -1)
    vals = jax.nn.sigmoid(mlp.apply(mlp_params, inp)).reshape(R, R, 3)
    rows.append(np.asarray(vals))
  grid = np.concatenate(rows, axis=1)

  import imageio.v2 as imageio
  os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
  imageio.imwrite(args.out, (np.clip(grid, 0, 1) * 255).astype(np.uint8))
  print(f"wrote {args.out} ({args.slices} phi_d slices)")


if __name__ == "__main__":
  main()
