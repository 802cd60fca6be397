#!/usr/bin/env python3
"""Trace the NeRFAE training collapse (QUALITY_r04 `ae` row: 13.5 dB at
the sweep recipe — lr 1e-3, cosine(1500), batch 4096, 30 views, 48px).

Judge r04 reproduced: the collapse hits BOTH the fused one-kernel step
and the XLA oracle at intermediate/encoding width 32 (loss jumps
0.013 -> 0.044 between steps 200-300, then pins to a constant-output
basin), while an oracle at intermediate_size=48 trains to 32.2 dB —
i.e. a recipe/width instability, not a kernel bug. This script finds
the MECHANISM: it runs the exact recipe (oracle or fused, --path) and
logs, every --probe steps,
  - loss + global grad norm + per-module grad norms,
  - the PRE-normalization encoder norm distribution (min/mean): the
    normalize_latent backward scales like 1/||enc||, so a near-zero
    encoder norm is the classic spike source,
  - the density-head pre-activation (softplus input) min/mean/max and
    the mean opacity: a dive to very-negative sigma = the transparent
    constant-output basin,
and stops early once the loss has pinned. Mitigations are probed with
--clip / --lr / --warmup to identify the minimal recipe fix.

Run (TPU): python scripts/diag_ae_collapse.py --path fused --steps 600
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

import optax

from nerf_atlas_tpu import models
from nerf_atlas_tpu.data import loaders, sampler, synthetic
from nerf_atlas_tpu.ops import rays as rays_ops
from nerf_atlas_tpu.ops.pallas.render_ae import fused_ae_train_step


def module_norms(tree, prefix=""):
  out = {}
  for path, leaf in jax.tree_util.tree_leaves_with_path(tree):
    ks = jax.tree_util.keystr(path)
    mod = ks.split("'")[1] if "'" in ks else ks  # top module name
    out[mod] = out.get(mod, 0.0) + float(jnp.sum(leaf.astype(jnp.float32)
                                                 ** 2))
  return {k: float(np.sqrt(v)) for k, v in out.items()}


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--path", choices=["oracle", "fused"], default="oracle")
  ap.add_argument("--steps", type=int, default=600)
  ap.add_argument("--sched-steps", type=int, default=1500,
                  help="cosine horizon (the sweep's epochs)")
  ap.add_argument("--lr", type=float, default=1e-3)
  ap.add_argument("--clip", type=float, default=0.0)
  ap.add_argument("--warmup", type=int, default=0)
  ap.add_argument("--latent-l2", type=float, default=0.0,
                  help="pre-normalization encoder-norm penalty (the "
                       "reference's latent_l2, ref src/nerf.py:810-812) "
                       "on a sampled point batch — the norm-runaway "
                       "antidote")
  ap.add_argument("--probe", type=int, default=10)
  ap.add_argument("--batch", type=int, default=4096)
  ap.add_argument("--size", type=int, default=48)
  ap.add_argument("--views", type=int, default=30)
  ap.add_argument("--out", default="/tmp/diag_ae_trace.json")
  args = ap.parse_args()

  imgs, cam, _ = synthetic.dataset(num_views=args.views, size=args.size,
                                   seed=0)
  ds = sampler.RayDataset.from_bundle(
      loaders.DatasetBundle(imgs, cam, None), size=args.size)
  model = models.NeRFAE(refl_kind="view", steps=64, t_near=2.0,
                        t_far=6.0, normalize_latent=True)
  key = jax.random.PRNGKey(0)
  r0, _, _, _ = ds.sample(key, 8)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, r0, train=True)

  if args.warmup > 0:
    lr = optax.warmup_cosine_decay_schedule(
        0.0, args.lr, args.warmup, args.sched_steps,
        end_value=5e-5)
  else:
    lr = optax.cosine_decay_schedule(args.lr, args.sched_steps,
                                     alpha=5e-5 / args.lr)
  parts = []
  if args.clip > 0:
    parts.append(optax.clip_by_global_norm(args.clip))
  parts.append(optax.adam(lr))
  tx = optax.chain(*parts)
  opt_state = tx.init(params)

  kw = dict(steps=64, t_near=2.0, t_far=6.0,
            sigmoid_kind=model.sigmoid_kind, sky_kind=model.sky_kind)

  def oracle_loss(p, rays, pix, k):
    out = model.apply(p, rays, train=True, rngs={"sampler": k})
    return jnp.mean((out["rgb"] - pix[..., :3]) ** 2)

  def latent_l2_reg(p, k):
    pts = jax.random.uniform(k, (1024, 3), jnp.float32, -1.3, 1.3)
    enc_raw = model.apply(p, pts, method=lambda m, x: m.encoder(x, None))
    return args.latent_l2 * jnp.mean(jnp.sum(enc_raw ** 2, -1))

  @jax.jit
  def step(p, s, k):
    k1, k2, k3 = jax.random.split(k, 3)
    rays, pix, _, _ = ds.sample(k1, args.batch, jitter=1.0)
    if args.path == "fused":
      ts = rays_ops.compute_ts(2.0, 6.0, 64, perturb=1.0, key=k2)[None]
      loss, grads = fused_ae_train_step(p, rays, pix[..., :3], ts, **kw)
    else:
      loss, grads = jax.value_and_grad(oracle_loss)(p, rays, pix, k2)
    if args.latent_l2 > 0:
      rl, rg = jax.value_and_grad(latent_l2_reg)(p, k3)
      loss = loss + rl
      grads = jax.tree.map(jnp.add, grads, rg)
    gnorm = optax.global_norm(grads)
    updates, s = tx.update(grads, s, p)
    p = optax.apply_updates(p, updates)
    return p, s, loss, gnorm, grads

  @jax.jit
  def probe(p, k):
    """Internal state stats on a fresh batch (oracle graph, f32)."""
    rays, pix, _, _ = ds.sample(k, 2048, jitter=1.0)
    pts, ts, r_o, r_d = model.apply(p, rays, train=False,
                                    method=lambda m, r, train:
                                    m.sample_points(r, train))
    enc_raw = model.apply(p, pts, method=lambda m, x: m.encoder(x, None))
    norms = jnp.linalg.norm(enc_raw, axis=-1)
    enc = enc_raw / jnp.maximum(norms[..., None], 1e-6)
    dout = model.apply(p, enc, method=lambda m, e: m.density_tfm(e))
    sig_in = dout[..., 0]
    out = model.apply(p, rays, train=False)
    return dict(
        enc_norm_min=jnp.min(norms), enc_norm_mean=jnp.mean(norms),
        enc_norm_p01=jnp.percentile(norms, 1.0),
        sigma_min=jnp.min(sig_in), sigma_mean=jnp.mean(sig_in),
        sigma_max=jnp.max(sig_in),
        rgb_var=jnp.var(out["rgb"]),
        mse=jnp.mean((out["rgb"] - pix[..., :3]) ** 2))

  trace = []
  key = jax.random.PRNGKey(1234)
  prev = None
  for i in range(args.steps):
    key, k = jax.random.split(key)
    params, opt_state, loss, gnorm, grads = step(params, opt_state, k)
    if i % args.probe == 0 or i == args.steps - 1:
      st = {k2: float(v) for k2, v in probe(params,
                                            jax.random.PRNGKey(7)).items()}
      rec = dict(step=i, loss=float(loss), grad_norm=float(gnorm),
                 grad_mods=module_norms(grads), **st)
      trace.append(rec)
      with open(args.out, "w") as f:  # incremental: survive a timeout
        json.dump(dict(args=vars(args), trace=trace), f, indent=2)
      print(f"step {i:5d} loss {rec['loss']:.5f} |g| {rec['grad_norm']:9.3f}"
            f" encmin {rec['enc_norm_min']:.4f}"
            f" sig[{rec['sigma_min']:+7.1f},{rec['sigma_mean']:+7.1f},"
            f"{rec['sigma_max']:+7.1f}] rgbvar {rec['rgb_var']:.5f}"
            f" probe-mse {rec['mse']:.5f}")
      # early stop once pinned: rgb variance ~ 0 and loss flat high
      if prev and rec["rgb_var"] < 1e-5 and rec["loss"] > 0.03 \
         and prev["rgb_var"] < 1e-5 and i > 100:
        print("[diag] constant-output basin reached; stopping early")
        break
      prev = rec
  with open(args.out, "w") as f:
    json.dump(dict(args=vars(args), trace=trace), f, indent=2)
  print(f"wrote {args.out}")


if __name__ == "__main__":
  main()
