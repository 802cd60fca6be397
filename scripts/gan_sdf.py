#!/usr/bin/env python3
"""GAN-trained SDF generator: an MLP SDF learns to match a target shape
distribution against a PointNet discriminator over surface samples.

Capability parity: /root/reference/scripts/gan_sdf.py (657 LoC) — targets
are an analytic sphere or a trained VolSDF checkpoint's SDF; plain-MLP or
latent-conditioned multi-resolution generator (--g-model multi_res);
global plus rescaled-local discrimination; orthographic turntable
rendering of normals/depth.

Usage:
  python scripts/gan_sdf.py --steps 2000 --target sphere --out outputs/gan_sdf
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
  a.add_argument("--steps", type=int, default=1000)
  a.add_argument("--batch", type=int, default=512)
  a.add_argument("--target", default="sphere",
                 choices=["sphere", "spheres", "checkpoint"])
  a.add_argument("--load", default=None,
                 help="VolSDF checkpoint for --target checkpoint")
  a.add_argument("--g-model", default="mlp", choices=["mlp", "multi_res"],
                 help="generator: plain MLP SDF or the latent-conditioned "
                      "multi-resolution generator")
  a.add_argument("--latent-size", type=int, default=32,
                 help="per-resolution latent size for multi_res")
  a.add_argument("--resolutions", type=int, default=3)
  a.add_argument("--out", default="outputs/gan_sdf")
  a.add_argument("--render-size", type=int, default=64)
  a.add_argument("-lr", type=float, default=1e-4)
  return a.parse_args()


def _smooth_floor(x, r):
  """Smooth staircase: quantizes x to steps of r while staying C∞ (the
  coarser MultiRes tiers see spatially-smoothed coordinates; reference
  scripts/gan_sdf.py:28-29 — its missing 1/(2π) makes the original
  non-monotone, the intended monotone form is used here)."""
  return x - jnp.sin(2 * jnp.pi * x / r) * r / (2 * jnp.pi)


class MultiResSDF:
  """Latent-conditioned multi-resolution SDF generator (reference
  scripts/gan_sdf.py:464-497): one latent-conditioned MLP per resolution
  tier, coarser tiers read smooth-floored coordinates, outputs sum. The
  learned `latent` parameter is the GAN's generator code."""

  def __init__(self, latent_size: int = 32, resolutions: int = 3):
    from flax import linen as nn

    from nerf_atlas_tpu.nn import FourierEncoder, SkipConnMLP

    class _Mod(nn.Module):
      lat: int
      res: int

      @nn.compact
      def __call__(self, pts):
        latent = self.param("latent", nn.initializers.normal(1.0),
                            (self.res, self.lat))
        out = 0.0
        for i in range(self.res):
          x = pts if i == 0 else _smooth_floor(pts, 1.0 / i)
          l_i = jnp.broadcast_to(latent[i], pts.shape[:-1] + (self.lat,))
          mlp = SkipConnMLP(in_size=3, out=1, latent_size=self.lat,
                            enc=FourierEncoder(input_dims=3),
                            num_layers=4, hidden_size=256,
                            name=f"tier_{i}")
          out = out + mlp(x, l_i)
        # sphere-biased init like the plain generator
        return (out[..., 0] + jnp.linalg.norm(pts, axis=-1) - 1.0,
                out[..., 1:])

    self.mod = _Mod(lat=latent_size, res=resolutions)

  def init(self, key, pts):
    return self.mod.init(key, pts)

  def apply(self, params, pts):
    return self.mod.apply(params, pts)


def target_sdf_fn(args):
  from nerf_atlas_tpu.data import synthetic
  if args.target == "sphere":
    return lambda p: jnp.linalg.norm(p, axis=-1) - 0.7
  if args.target == "spheres":
    return synthetic.scene_sdf
  # trained VolSDF checkpoint
  from nerf_atlas_tpu import models
  from nerf_atlas_tpu.train import checkpoints
  model = models.VolSDF()
  rays = jnp.zeros((4, 6))
  fresh = model.init({"params": jax.random.PRNGKey(0),
                      "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  params, _ = checkpoints.restore_or_graft(args.load, fresh)
  return lambda p: model.apply(params, p, method="sdf_value")


def sample_surface(key, sdf_fn, n, iters: int = 8):
  """Project random points to the zero set by sphere-march steps."""
  pts = jax.random.uniform(key, (n, 3), minval=-1, maxval=1)
  for _ in range(iters):
    d = sdf_fn(pts)
    g = jax.grad(lambda p: sdf_fn(p).sum())(pts)
    g = g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-6)
    pts = pts - d[:, None] * g
  return pts


def local_patch(pts, key, k: int = 128):
  """Rescaled-local view of a point cloud: pick a random center among the
  samples, take its k nearest neighbors, recenter, and rescale to unit
  radius — the discriminator then judges local surface detail
  independent of global scale (the reference's rescaled-local
  discrimination)."""
  c = pts[jax.random.randint(key, (), 0, pts.shape[0])]
  d2 = jnp.sum(jnp.square(pts - c), axis=-1)
  _, idx = jax.lax.top_k(-d2, k)
  patch = pts[idx] - c
  scale = jnp.sqrt(jnp.max(jnp.sum(patch * patch, -1))) + 1e-6
  return patch / scale


def main():
  args = arguments()
  os.makedirs(args.out, exist_ok=True)
  from nerf_atlas_tpu import models
  from nerf_atlas_tpu.nn import PointNet

  if args.g_model == "multi_res":
    gen = MultiResSDF(latent_size=args.latent_size,
                      resolutions=args.resolutions)
  else:
    gen = models.load_sdf_shape("mlp")
  disc = PointNet(feats=128)         # global shape discriminator
  disc_local = PointNet(feats=64)    # rescaled-local patch discriminator
  tgt = target_sdf_fn(args)
  k_local = min(128, args.batch)

  key = jax.random.PRNGKey(0)
  pts0 = jax.random.uniform(key, (args.batch, 3), minval=-1, maxval=1)
  gp = gen.init(jax.random.PRNGKey(1), pts0)
  dp = {"global": disc.init(jax.random.PRNGKey(2), pts0),
        "local": disc_local.init(jax.random.PRNGKey(3), pts0[:k_local])}
  g_opt, d_opt = optax.adam(args.lr), optax.adam(args.lr)
  g_st, d_st = g_opt.init(gp), d_opt.init(dp)

  gen_sdf = lambda prm, p: gen.apply(prm, p)[0]

  def discriminate(dp, pts, key):
    """Global logit + rescaled-local patch logit."""
    g = disc.apply(dp["global"], pts)
    l = disc_local.apply(dp["local"], local_patch(pts, key, k_local))
    return g + l

  @jax.jit
  def step(gp, dp, g_st, d_st, key):
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    real = sample_surface(k1, tgt, args.batch)

    def d_loss_fn(dp):
      fake = sample_surface(k2, lambda p: gen_sdf(gp, p), args.batch)
      dr = discriminate(dp, real, k4)
      df = discriminate(dp, jax.lax.stop_gradient(fake), k5)
      return (optax.sigmoid_binary_cross_entropy(dr, jnp.ones_like(dr))
              + optax.sigmoid_binary_cross_entropy(df, jnp.zeros_like(df))
              ).mean()

    dl, dg = jax.value_and_grad(d_loss_fn)(dp)
    du, d_st = d_opt.update(dg, d_st)
    dp = optax.apply_updates(dp, du)

    def g_loss_fn(gp):
      fake = sample_surface(k3, lambda p: gen_sdf(gp, p), args.batch)
      df = discriminate(dp, fake, k5)
      gan = optax.sigmoid_binary_cross_entropy(
          df, jnp.ones_like(df)).mean()
      # eikonal keeps the generator a valid SDF
      rnd = jax.random.uniform(k3, (args.batch, 3), minval=-1, maxval=1)
      n = jax.grad(lambda p: gen_sdf(gp, p).sum())(rnd)
      eik = jnp.mean(jnp.square(jnp.linalg.norm(n, axis=-1) - 1))
      return gan + 0.1 * eik

    gl, gg = jax.value_and_grad(g_loss_fn)(gp)
    gu, g_st = g_opt.update(gg, g_st)
    gp = optax.apply_updates(gp, gu)
    return gp, dp, g_st, d_st, dl, gl

  for i in range(args.steps):
    key, k = jax.random.split(key)
    gp, dp, g_st, d_st, dl, gl = step(gp, dp, g_st, d_st, k)
    if (i + 1) % 100 == 0:
      print(f"step {i+1}: d_loss {float(dl):.4f} g_loss {float(gl):.4f}")

  # orthographic turntable normals render
  from nerf_atlas_tpu.data import cameras, synthetic
  from nerf_atlas_tpu.ops import march
  import imageio.v2 as imageio
  S = args.render_size
  frames = []
  for ang in np.linspace(0, 2 * np.pi, 8, endpoint=False):
    eye = (2.0 * np.cos(ang), 0.5, 2.0 * np.sin(ang))
    pose = synthetic.look_at(eye, (0, 0, 0))[None]
    cam = cameras.OrthogonalCamera(cam_to_world=pose, view_width=2.5)
    xs = jnp.arange(S, dtype=jnp.float32) + 0.5
    gy, gx = jnp.meshgrid(xs, xs, indexing="ij")
    rays = cam.rays_at(jnp.zeros_like(gx, jnp.int32),
                       jnp.stack([gx, gy], -1), S).reshape(-1, 6)
    pts, hits, _, _ = march.bisect(lambda p: gen_sdf(gp, p),
                                   rays[:, :3], rays[:, 3:], iters=64,
                                   near=0.0, far=4.0)
    n = jax.grad(lambda p: gen_sdf(gp, p).sum())(pts)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-6)
    img = jnp.where(hits[:, None], n * 0.5 + 0.5, 0.0).reshape(S, S, 3)
    frames.append((np.clip(np.asarray(img), 0, 1) * 255).astype(np.uint8))
  imageio.mimwrite(os.path.join(args.out, "turntable.gif"), frames, loop=0)
  print(f"wrote {args.out}/turntable.gif")


if __name__ == "__main__":
  main()
