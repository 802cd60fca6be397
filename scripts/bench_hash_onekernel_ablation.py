#!/usr/bin/env python3
"""Stage ablation of the ONE-kernel hash train step (judge r04 #6c).

The step (ops/pallas/render.py:fused_plain_hash_train_step) has four
measurable stages at the bench config (8192 rays x 64 steps = 524288
points, T = 2^14, L = 8, F = 2):

  A. XLA-side index/weight math + corner-major pack (_idx_w_all,
     _pack_corner_major) — shared by encode fwd and bwd (CSE'd by XLA
     inside the jitted step);
  B. one-hot encode FORWARD kernel (hash_encode._hash_fwd_kernel);
  C. downstream loss-mode backward kernel (the fused MLP+composite
     train kernel, feats as input) — its cost is the CP one-kernel
     step minus the CP encode, i.e. the non-hash floor;
  D. one-hot encode BACKWARD kernel (table cotangent).

Each timing jits exactly one stage (inputs precomputed, device-put),
so the sum vs the full step also exposes scheduling/dispatch overhead.
Also probes block_pts = {512, 1024, 2048} for B and D at S = 128 (the
2048 compile-crash note in hash_encode.py was measured at S = 512).

Run on the chip: python scripts/bench_hash_onekernel_ablation.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
import numpy as np

from nerf_atlas_tpu import models
from nerf_atlas_tpu.ops.pallas import hash_encode as he
from nerf_atlas_tpu.ops.pallas.render import (
    _linspace_ts, fused_plain_cp_train_step, fused_plain_hash_train_step,
    _hash_pts, _hash_table)

N_RAYS = 8192
STEPS = 64
LOG2_T = 14
ITERS = 20


def _time(fn, *args, iters=ITERS):
  out = fn(*args)
  jax.block_until_ready(out)
  # force a device->host reduction per iter (remote-attached timing note
  # in bench.py)
  t0 = time.perf_counter()
  for _ in range(iters):
    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.sum(leaf))
  return (time.perf_counter() - t0) / iters


def main():
  key = jax.random.PRNGKey(0)
  r_o = jnp.tile(jnp.array([[0.0, 0.0, 3.5]]), (N_RAYS, 1))
  r_d = (jax.random.normal(key, (N_RAYS, 3)) * 0.2
         + jnp.array([0.0, 0.0, -1.0]))
  rays = jnp.concatenate([r_o, r_d], -1)
  target = jax.random.uniform(jax.random.PRNGKey(1), (N_RAYS, 3))

  model = models.PlainNeRF(steps=STEPS, t_near=2.0, t_far=6.0,
                           enc_kind="hash",
                           enc_kwargs={"table_size": 1 << LOG2_T})
  params = model.init({"params": key, "sampler": jax.random.PRNGKey(2)},
                      rays[:256], train=True)
  table = _hash_table(params)
  T = table.shape[0] // 8
  ts = _linspace_ts(STEPS, 2.0, 6.0)
  pts = _hash_pts(rays, ts, STEPS)
  P = pts.shape[0]
  res = {"n_rays": N_RAYS, "steps": STEPS, "points": P, "table_log2": LOG2_T}

  # full step (the bench number)
  step = jax.jit(lambda p, r, t: fused_plain_hash_train_step(p, r, t, ts))
  dt = _time(step, params, rays, target)
  res["full_step_ms"] = round(dt * 1e3, 2)
  res["full_step_rays_per_sec"] = round(N_RAYS / dt, 1)

  # CP one-kernel step on the same rays = the non-hash floor (stage C +
  # CP encode, which is a few matmul columns — negligible vs hash)
  cp_model = models.PlainNeRF(steps=STEPS, t_near=2.0, t_far=6.0,
                              enc_kind="cp")
  cp_params = cp_model.init({"params": key,
                             "sampler": jax.random.PRNGKey(2)},
                            rays[:256], train=True)
  cp_step = jax.jit(
      lambda p, r, t: fused_plain_cp_train_step(p, r, t, ts))
  dt_cp = _time(cp_step, cp_params, rays, target)
  res["cp_step_ms"] = round(dt_cp * 1e3, 2)

  # stage A: index/weight + pack
  def packed(pts_):
    idx, w = he._idx_w_all(pts_, tuple(he._resolutions(8, 16, 2048)),
                           T, -1.0, 1.0)
    return (he._pack_corner_major(idx >> 7, he.DEFAULT_BLOCK_PTS),
            he._pack_corner_major(idx & 127, he.DEFAULT_BLOCK_PTS),
            he._pack_corner_major(w, he.DEFAULT_BLOCK_PTS))
  pack_j = jax.jit(packed)
  res["pack_ms"] = round(_time(pack_j, pts) * 1e3, 2)

  # stage B / D at several block sizes (S = T/128 = 128 here; the 2048
  # crash note was measured at S = 512)
  g = jax.random.normal(jax.random.PRNGKey(3), (P, 16), jnp.float32)
  for bp in (512, 1024, 2048):
    try:
      enc = jax.jit(lambda tb, p_: he.hash_encode(
          tb, p_, levels=8, table_size=T, block_pts=bp))
      res[f"fwd_kernel_bp{bp}_ms"] = round(_time(enc, table, pts) * 1e3, 2)

      def fwd_bwd(tb, p_, g_):
        out, vjp = jax.vjp(lambda t_: he.hash_encode(
            t_, p_, levels=8, table_size=T, block_pts=bp), tb)
        return vjp(g_)[0]
      fb = jax.jit(fwd_bwd)
      res[f"fwdbwd_kernel_bp{bp}_ms"] = round(
          _time(fb, table, pts, g) * 1e3, 2)
    except Exception as e:  # noqa: BLE001
      res[f"bp{bp}_error"] = f"{type(e).__name__}: {str(e)[:200]}"

  # derived attribution
  if "fwdbwd_kernel_bp1024_ms" in res:
    hash_ms = res["fwdbwd_kernel_bp1024_ms"]
    res["attribution"] = {
        "hash_encode_fwd_plus_bwd_ms": hash_ms,
        "downstream_train_kernel_ms(cp_step)": res["cp_step_ms"],
        "sum_ms": round(hash_ms + res["cp_step_ms"], 2),
        "full_ms": res["full_step_ms"],
        "unattributed_ms": round(
            res["full_step_ms"] - hash_ms - res["cp_step_ms"], 2),
    }
  print(json.dumps(res, indent=2))
  with open(os.path.join(os.path.dirname(os.path.dirname(
      os.path.abspath(__file__))), "outputs", "hash_ablation.json"),
      "w") as f:
    json.dump(res, f, indent=2)


if __name__ == "__main__":
  main()
