#!/usr/bin/env python3
"""On-chip (real TPU) gradient parity for the one-kernel NeRFAE train
step vs the pure-JAX XLA oracle — the interpret-mode tests
(tests/test_pallas_ae.py) cannot see Mosaic/bf16 lowering traps
(BENCH_NOTES: the bf16 phase trap, the dynamic_gather envelope), so a
hardware check is the discriminating experiment when an AE training
run underperforms (QUALITY sweep `ae` row).

Checks the kernel's ONLY served envelope — normalize_latent=True: the
kernel L2-normalizes the latent unconditionally (render_ae.py) and the
driver gate requires model.normalize_latent (train/driver.py), so a
normalize_latent=False comparison is apples-to-oranges by construction
and is deliberately NOT checked (advisor r04 medium: the old variant
made this diagnostic fail for a config the kernel never serves).
Runs at the sweep's real step count (64), small ray batch. Prints
per-leaf cosine + global rel-err, exits nonzero on failure.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)

from nerf_atlas_tpu import models

from nerf_atlas_tpu.ops.pallas.render_ae import fused_ae_train_step


def check(normalize_latent: bool, n=512, steps=64, seed=3) -> bool:
  model = models.NeRFAE(refl_kind="view", steps=steps, t_near=2.0,
                        t_far=6.0, normalize_latent=normalize_latent)
  key = jax.random.PRNGKey(seed)
  r_o = jnp.tile(jnp.array([[0.0, 0, 3.5]]), (n, 1))
  r_d = jax.random.normal(key, (n, 3)) * 0.2 + jnp.array([0.0, 0, -1.0])
  rays = jnp.concatenate([r_o, r_d], -1)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays,
                      train=True)
  target = jax.random.uniform(jax.random.PRNGKey(5), (n, 3))

  # ts=None on both sides: the kernel and the no-rng oracle apply both
  # use the deterministic unperturbed sample positions
  lf, gf = jax.jit(lambda p: fused_ae_train_step(
      p, rays, target, None, steps=steps, t_near=2.0, t_far=6.0,
      sigmoid_kind=model.sigmoid_kind, sky_kind=model.sky_kind))(params)

  def loss_oracle(p):
    out = model.apply(p, rays)
    return jnp.mean((out["rgb"] - target) ** 2)

  lo, go = jax.jit(jax.value_and_grad(loss_oracle))(params)

  tag = f"normalize_latent={normalize_latent}"
  print(f"[{tag}] loss fused={float(lf):.6f} oracle={float(lo):.6f}")
  ok = abs(float(lf) - float(lo)) / max(abs(float(lo)), 1e-12) < 2e-2

  flat_f = dict(jax.tree_util.tree_leaves_with_path(gf))
  num = den = 0.0
  for path, g_orc in jax.tree_util.tree_leaves_with_path(go):
    a = np.asarray(flat_f[path], np.float64)
    b = np.asarray(g_orc, np.float64)
    num += np.sum((a - b) ** 2)
    den += np.sum(b ** 2)
    nb = np.linalg.norm(b)
    if nb < 1e-12:
      status = "zero-oracle" if np.linalg.norm(a) < 1e-6 else "SPURIOUS"
      cos = float("nan")
    else:
      cos = float((a * b).sum()
                  / max(np.linalg.norm(a) * nb, 1e-20))
      status = "ok" if cos > 0.95 else "BAD"
      ok &= cos > 0.95
    print(f"  {jax.tree_util.keystr(path):60s} cos={cos:+.4f} "
          f"|o|={nb:.3e} {status}")
  rel = float(np.sqrt(num / max(den, 1e-20)))
  print(f"[{tag}] global grad rel err {rel:.4f}")
  ok &= rel < 0.08
  return ok


if __name__ == "__main__":
  print("backend:", jax.default_backend())
  ok = check(normalize_latent=True)
  print("RESULT:", "PASS" if ok else "FAIL")
  sys.exit(0 if ok else 1)
