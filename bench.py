#!/usr/bin/env python3
"""Benchmark: rays/sec/chip rendering an 800×800 view with the flagship
PlainNeRF (CP factorized-volume encoder + view reflectance, 64
samples/ray, bf16 compute) — the BASELINE.json primary metric.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Timing note: on remote-attached TPUs, `block_until_ready` can return
before remote execution completes; every measured iteration therefore
forces a device→host reduction (`float(out.sum())`), which cannot be
satisfied without executing the computation.

Baseline derivation (the reference publishes no rays/sec — BASELINE.md):
its canonical `original` recipe trains 80k steps of 4-view × 16×16-crop
batches (= 1024 rays/step) in ≈1 day on the author's GPU
(/root/reference/readme.md:106-107,133; makefile:8-13) → ≈950 rays/sec.
We use 1000 rays/sec as the reference baseline.
"""
from __future__ import annotations

import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp

REFERENCE_RAYS_PER_SEC = 1000.0
SIZE = 800
STEPS = 64
CHUNK = 131_072


def main():
  from nerf_atlas_tpu import models

  model = models.PlainNeRF(steps=STEPS, t_near=2.0, t_far=6.0,
                           refl_kind="view", sky_kind="black",
                           enc_kind="cp", dtype=jnp.bfloat16)
  key = jax.random.PRNGKey(0)
  r_o = jnp.tile(jnp.array([[0.0, 0.0, 3.5]]), (CHUNK, 1))
  r_d = jax.random.normal(key, (CHUNK, 3)) * 0.1 + jnp.array([0., 0., -1.])
  rays = jnp.concatenate([r_o, r_d], axis=-1)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays[:256],
                      train=True)

  from nerf_atlas_tpu.ops.pallas import fused_plain_cp_render

  @jax.jit
  def render(params, rays):
    out = fused_plain_cp_render(params, rays, steps=STEPS, t_near=2.0,
                                t_far=6.0)[:, :3]
    return out, jnp.sum(out)

  @jax.jit
  def render_xla(params, rays):
    out = model.apply(params, rays)["rgb"]
    return out, jnp.sum(out)

  # warmup/compile + force execution; fall back to the pure-XLA path if
  # the fused kernel cannot compile on this backend
  try:
    _, s = render(params, rays)
    float(s)
  except Exception as e:  # noqa: BLE001
    print(f"# fused kernel unavailable ({type(e).__name__}); XLA path",
          flush=True)
    render = render_xla
    _, s = render(params, rays)
    float(s)

  n_rays = SIZE * SIZE
  n_chunks = (n_rays + CHUNK - 1) // CHUNK
  reps = 3
  t0 = time.perf_counter()
  for _ in range(reps):
    for _ in range(n_chunks):
      _, s = render(params, rays)
      float(s)  # device->host sync: forces real execution
  dt = (time.perf_counter() - t0) / reps
  rays_per_sec = n_chunks * CHUNK / dt

  print(json.dumps({
      "metric": "rays/sec/chip, 800x800 render, PlainNeRF-CP 64 steps",
      "value": round(rays_per_sec, 1),
      "unit": "rays/s",
      "vs_baseline": round(rays_per_sec / REFERENCE_RAYS_PER_SEC, 2),
  }))


if __name__ == "__main__":
  main()
