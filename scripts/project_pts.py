#!/usr/bin/env python3
"""Project RigNeRF rig points into every camera and write overlay images.

Capability parity: /root/reference/scripts/project_pts.py (the reference's
version dies on a leftover exit(); this one works).
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def arguments():
  a = argparse.ArgumentParser()
  a.add_argument("--load", default=None, help="RigNeRF checkpoint")
  a.add_argument("--size", type=int, default=64)
  a.add_argument("--num-views", type=int, default=4)
  a.add_argument("--out", default="outputs/rig_projection")
  return a.parse_args()


def main():
  args = arguments()
  os.makedirs(args.out, exist_ok=True)
  from nerf_atlas_tpu import models
  from nerf_atlas_tpu.data import loaders, sampler

  bundle = loaders.synthetic_spheres(size=args.size,
                                     num_views=args.num_views)
  ds = sampler.RayDataset.from_bundle(bundle, size=args.size)
  model = models.RigNeRF(n_points=16, steps=16, t_near=1.5, t_far=4.5)
  rays, _, _ = ds.sample_rays(jax.random.PRNGKey(0), 8)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  if args.load:
    from nerf_atlas_tpu.train import checkpoints
    params, _ = checkpoints.restore_or_graft(args.load, params)

  points = params["params"]["rig_points"]
  import imageio.v2 as imageio
  for v in range(ds.num_views):
    cam = ds.camera[jnp.array([v])]
    uv = np.asarray(cam.project_pts(points, args.size))[0] \
        if cam.project_pts(points, args.size).ndim == 3 \
        else np.asarray(cam.project_pts(points, args.size))
    img = np.asarray(ds.pixels[v][..., :3]).copy()
    for (x, y) in uv.reshape(-1, 2):
      xi, yi = int(round(x)), int(round(y))
      if 0 <= xi < args.size and 0 <= yi < args.size:
        img[yi, xi] = [1.0, 1.0, 0.0]
    imageio.imwrite(os.path.join(args.out, f"proj_{v:02d}.png"),
                    (np.clip(img, 0, 1) * 255).astype(np.uint8))
  print(f"wrote {ds.num_views} overlays to {args.out}")


if __name__ == "__main__":
  main()
