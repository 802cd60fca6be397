#!/usr/bin/env python3
"""Benchmark: rays/sec/chip on a REAL 800×800 camera frame with the
flagship PlainNeRF (CP factorized-volume encoder + view reflectance, 64
samples/ray, bf16 compute) — the BASELINE.json primary metric — plus
train-step throughput (fused custom-VJP kernel vs the XLA oracle).

Output protocol (timeout-proof): the headline JSON line prints
IMMEDIATELY after the flagship measurements; per-config rows then flush
incrementally as `# config ...` comment lines (mirrored to
BENCH_CONFIGS.json); the LAST line is the full combined JSON. A driver
that parses the last JSON line gets the full result on a clean run and
the headline on a timeout. Wall-clock budget: env BENCH_BUDGET_SEC
(default 1500); configs that don't fit are listed in "skipped".

Timing note: on remote-attached TPUs, `block_until_ready` can return
before remote execution completes; every measured iteration therefore
forces a device→host reduction (`float(out.sum())`), which cannot be
satisfied without executing the computation.

Baseline: `vs_baseline` divides by the MEASURED PyTorch reference
training throughput when `BASELINE.json:measured_reference` exists
(produced by scripts/bench_reference.py — the reference's own hot loop,
on this host's CPU since the reference needs a GPU it doesn't have
here; see BASELINE.md for the honest caveats). Fallback: the readme
anecdote ≈1000 rays/s (80k steps × 1024 rays ≈ 1 day on the author's
GPU, /root/reference/readme.md:106-133).
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
import numpy as np

ANECDOTE_RAYS_PER_SEC = 1000.0
SIZE = 800
STEPS = 64
CHUNK = 131_072
TRAIN_BATCH = 8192


def _baseline():
  try:
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BASELINE.json")) as f:
      base = json.load(f)
    m = base["measured_reference"]
    return float(m["reference_train_rays_per_sec"]), (
        f"measured ({m['device']}, scripts/bench_reference.py)")
  except Exception:  # noqa: BLE001
    return ANECDOTE_RAYS_PER_SEC, "readme anecdote (unmeasured)"


def _flagship(dtype):
  from nerf_atlas_tpu import models
  return models.PlainNeRF(steps=STEPS, t_near=2.0, t_far=6.0,
                          refl_kind="view", sky_kind="black",
                          enc_kind="cp", dtype=dtype)


def _frame_rays():
  """All rays of a real 800×800 view of the procedural scene (an actual
  camera sweep, not one repeated chunk)."""
  from nerf_atlas_tpu.data import cameras as cam_lib, synthetic
  poses = synthetic.hemisphere_poses(1, seed=0)
  cam = cam_lib.NeRFCamera.from_json_transforms(poses, 0.6911, SIZE)
  xs = (jnp.arange(SIZE, dtype=jnp.float32) + 0.5)
  gy, gx = jnp.meshgrid(xs, xs, indexing="ij")
  xy = jnp.stack([gx, gy], axis=-1)
  vidx = jnp.zeros(xy.shape[:-1], jnp.int32)
  return cam.rays_at(vidx, xy, SIZE).reshape(-1, 6)


def bench_render(params, rays):
  from nerf_atlas_tpu.ops.pallas import fused_plain_cp_render

  @jax.jit
  def render(params, rc, acc):
    out = fused_plain_cp_render(params, rc, steps=STEPS, t_near=2.0,
                                t_far=6.0)[:, :3]
    # fold into a running scalar: chains the chunks on device so ONE
    # final host sync forces the whole frame (per-chunk float() would
    # measure the remote-TPU tunnel round-trip, not the kernel)
    return acc + jnp.sum(out)

  n = rays.shape[0]
  pad = (-n) % CHUNK
  rays_p = jnp.pad(rays, ((0, pad), (0, 0)))
  chunks = [rays_p[i:i + CHUNK] for i in range(0, rays_p.shape[0], CHUNK)]
  float(render(params, chunks[0], jnp.float32(0)))   # compile + warm
  reps = 3
  t0 = time.perf_counter()
  acc = jnp.float32(0)
  for _ in range(reps):
    for rc in chunks:
      acc = render(params, rc, acc)
  float(acc)                                     # single device->host sync
  dt = (time.perf_counter() - t0) / reps
  return (n + pad) / dt


def bench_train(params, fused, one_kernel: bool = False):
  """Train-step rays/sec: fused custom-VJP kernel vs the XLA oracle.

  one_kernel=True measures the ONE-kernel fused L2 step
  (render.fused_plain_cp_train_step: the backward kernel computes the
  loss cotangent from its own forward recompute, eliminating the
  separate forward pass of the value_and_grad path)."""
  import optax
  from nerf_atlas_tpu.ops import rays as rays_ops
  from nerf_atlas_tpu.ops.pallas.render import (fused_plain_cp_render_train,
                                                fused_plain_cp_train_step)
  model = _flagship(jnp.bfloat16 if fused else jnp.float32)

  key = jax.random.PRNGKey(0)
  r_o = jnp.tile(jnp.array([[0.0, 0.0, 3.5]]), (TRAIN_BATCH, 1))
  r_d = (jax.random.normal(key, (TRAIN_BATCH, 3)) * 0.1
         + jnp.array([0.0, 0.0, -1.0]))
  rays = jnp.concatenate([r_o, r_d], axis=-1)
  target = jax.random.uniform(jax.random.PRNGKey(1), (TRAIN_BATCH, 3))
  tx = optax.adam(5e-4)
  opt_state = tx.init(params)

  @jax.jit
  def step(params, opt_state, k):
    def loss_fn(p):
      if fused:
        ts = rays_ops.compute_ts(2.0, 6.0, STEPS, perturb=1.0, key=k)[None]
        rgb = fused_plain_cp_render_train(p, rays, ts, steps=STEPS,
                                          t_near=2.0, t_far=6.0)[:, :3]
      else:
        rgb = model.apply(p, rays, train=True, rngs={"sampler": k})["rgb"]
      return jnp.mean((rgb - target) ** 2)

    if one_kernel:
      ts = rays_ops.compute_ts(2.0, 6.0, STEPS, perturb=1.0, key=k)[None]
      loss, grads = fused_plain_cp_train_step(params, rays, target, ts,
                                              steps=STEPS, t_near=2.0,
                                              t_far=6.0)
    else:
      loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state)
    return optax.apply_updates(params, updates), opt_state, loss

  k = jax.random.PRNGKey(2)
  p, s = params, opt_state
  p, s, l = step(p, s, k)
  float(l)                                       # compile + warm
  n = 20
  t0 = time.perf_counter()
  for i in range(n):
    p, s, l = step(p, s, jax.random.fold_in(k, i))
  # the param chain serializes the steps on device; syncing only the
  # final loss forces all n steps without paying the remote-TPU tunnel
  # round-trip per step
  float(l)
  dt = time.perf_counter() - t0
  return n * TRAIN_BATCH / dt


def _config_model(kind):
  """The five canonical BASELINE.json model families (reference makefile
  recipes original:8-13, ae:380-384, volsdf:21-28, dnerf:105-114)."""
  from nerf_atlas_tpu import models
  common = dict(steps=STEPS, t_near=2.0, t_far=6.0, sky_kind="black")
  if kind == "tiny":
    return models.TinyNeRF(**common), False
  if kind == "ae":
    return models.NeRFAE(**common), False
  if kind == "volsdf":
    return models.VolSDF(sdf_kind="mlp", refl_kind="view", **common), False
  if kind == "dnerf":
    return models.DynamicNeRF(
        canonical_kind="plain", canonical_kwargs={"enc_kind": "cp"},
        spline_points=0, **common), True
  if kind == "dnerf_spline":
    # Spline-NeRF (the reference repo's paper model; makefile dnerf
    # recipes pass --spline 5/6)
    return models.DynamicNeRF(
        canonical_kind="plain", canonical_kwargs={"enc_kind": "cp"},
        spline_points=5, **common), True
  if kind == "mip":
    return models.PlainNeRF(mip="cone", **common), False
  if kind == "posenc":
    # the classic NeRF frequency encoder (the reference's
    # PositionalEncoder; its `plain` default is the hash grid)
    return models.PlainNeRF(enc_kind="posenc", **common), False
  if kind == "hash":
    # the reference's DEFAULT PlainNeRF encoder family (NGP hash grid,
    # src/neural_blocks.py:92-193), TPU-fast config: T=2^14/level
    # engages the fused one-hot MXU lookup kernel
    # (ops/pallas/hash_encode.py)
    return models.PlainNeRF(enc_kind="hash",
                            enc_kwargs={"table_size": 1 << 14},
                            **common), False
  if kind == "hash_ref19":
    # the reference's exact default size (T=2^19): the XLA-gather
    # hybrid — gather-bound by measurement (BENCH_NOTES.md roofline)
    return models.PlainNeRF(enc_kind="hash", **common), False
  if kind == "coarse_fine":
    return models.CoarseFineNeRF(enc_kind="cp", fine_steps=STEPS,
                                 **common), False
  raise ValueError(kind)


def _train_batch():
  key = jax.random.PRNGKey(0)
  r_o = jnp.tile(jnp.array([[0.0, 0.0, 3.5]]), (TRAIN_BATCH, 1))
  r_d = (jax.random.normal(key, (TRAIN_BATCH, 3)) * 0.1
         + jnp.array([0.0, 0.0, -1.0]))
  rays = jnp.concatenate([r_o, r_d], axis=-1)
  target = jax.random.uniform(jax.random.PRNGKey(1), (TRAIN_BATCH, 3))
  times = jax.random.uniform(jax.random.PRNGKey(4), (TRAIN_BATCH,))
  return rays, target, times


def bench_config_train(kind, fused=False, n=15):
  """Train-step rays/s for one canonical config (XLA oracle, or the fused
  dyn kernel for kind='dnerf' with fused=True)."""
  import optax
  from nerf_atlas_tpu.ops import rays as rays_ops
  model, needs_times = _config_model(kind)
  rays, target, times = _train_batch()
  kwargs = {"times": times} if needs_times else {}
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays[:256],
                      train=True, **({k: v[:256] for k, v in kwargs.items()}
                                     if kwargs else {}))
  tx = optax.adam(5e-4)
  opt_state = tx.init(params)

  # kinds whose fused measurement uses the ONE-kernel L2 train step
  # (in-kernel loss cotangent — ops/pallas/*_train_step)
  one_kernel = fused and kind in ("tiny", "posenc", "mip", "hash", "ae",
                                  "volsdf", "dnerf", "dnerf_spline")

  @jax.jit
  def step(params, opt_state, k):
    if one_kernel:
      from nerf_atlas_tpu.ops.pallas.render import (
          fused_plain_cp_train_step, fused_plain_hash_train_step)
      ts = rays_ops.compute_ts(2.0, 6.0, STEPS, perturb=1.0, key=k)[None]
      common = dict(steps=STEPS, t_near=2.0, t_far=6.0)
      if kind == "hash":
        loss, grads = fused_plain_hash_train_step(params, rays, target,
                                                  ts, **common)
      elif kind == "ae":
        from nerf_atlas_tpu.ops.pallas.render_ae import fused_ae_train_step
        loss, grads = fused_ae_train_step(params, rays, target, ts,
                                          **common)
      elif kind == "volsdf":
        from nerf_atlas_tpu.ops.pallas.render_volsdf import (
            fused_volsdf_train_step)
        loss, grads = fused_volsdf_train_step(params, rays, target, ts,
                                              **common)
      elif kind in ("dnerf", "dnerf_spline"):
        from nerf_atlas_tpu.ops.pallas.render_dyn import (
            fused_dyn_cp_train_step)
        loss, grads = fused_dyn_cp_train_step(
            params, rays, times, target, ts,
            spline_points=5 if kind == "dnerf_spline" else 0, **common)
      else:
        enc = {"tiny": "tiny", "posenc": "posenc", "mip": "cone"}[kind]
        loss, grads = fused_plain_cp_train_step(params, rays, target, ts,
                                                enc_kind=enc, **common)
      updates, opt_state2 = tx.update(grads, opt_state)
      return optax.apply_updates(params, updates), opt_state2, loss

    def loss_fn(p):
      if fused and kind in ("dnerf", "dnerf_spline"):
        from nerf_atlas_tpu.ops.pallas.render_dyn import (
            fused_dyn_cp_render_train)
        ts = rays_ops.compute_ts(2.0, 6.0, STEPS, perturb=1.0, key=k)[None]
        spl = 5 if kind == "dnerf_spline" else 0
        rgb = fused_dyn_cp_render_train(p, rays, times, ts, steps=STEPS,
                                        t_near=2.0, t_far=6.0,
                                        spline_points=spl)[:, :3]
      elif fused and kind == "ae":
        from nerf_atlas_tpu.ops.pallas.render_ae import fused_ae_render_train
        ts = rays_ops.compute_ts(2.0, 6.0, STEPS, perturb=1.0, key=k)[None]
        rgb = fused_ae_render_train(p, rays, ts, steps=STEPS, t_near=2.0,
                                    t_far=6.0)[:, :3]
      elif fused and kind == "volsdf":
        from nerf_atlas_tpu.ops.pallas.render_volsdf import (
            fused_volsdf_render_train)
        ts = rays_ops.compute_ts(2.0, 6.0, STEPS, perturb=1.0, key=k)[None]
        rgb = fused_volsdf_render_train(p, rays, ts, steps=STEPS,
                                        t_near=2.0, t_far=6.0)[:, :3]
      elif fused and kind == "mip":
        from nerf_atlas_tpu.ops.pallas.render import (
            fused_plain_mip_render_train)
        ts = rays_ops.compute_ts(2.0, 6.0, STEPS, perturb=1.0, key=k)[None]
        rgb = fused_plain_mip_render_train(p, rays, ts, mip_kind="cone",
                                           steps=STEPS, t_near=2.0,
                                           t_far=6.0)[:, :3]
      elif fused and kind == "posenc":
        from nerf_atlas_tpu.ops.pallas.render import (
            fused_plain_cp_render_train)
        ts = rays_ops.compute_ts(2.0, 6.0, STEPS, perturb=1.0, key=k)[None]
        rgb = fused_plain_cp_render_train(p, rays, ts, enc_kind="posenc",
                                          steps=STEPS, t_near=2.0,
                                          t_far=6.0)[:, :3]
      elif fused and kind == "tiny":
        from nerf_atlas_tpu.ops.pallas.render import (
            fused_plain_cp_render_train)
        ts = rays_ops.compute_ts(2.0, 6.0, STEPS, perturb=1.0, key=k)[None]
        rgb = fused_plain_cp_render_train(p, rays, ts, enc_kind="tiny",
                                          steps=STEPS, t_near=2.0,
                                          t_far=6.0)[:, :3]
      elif fused and kind in ("hash", "hash_ref19"):
        from nerf_atlas_tpu.ops.pallas.render import (
            fused_plain_hash_render_train)
        ts = rays_ops.compute_ts(2.0, 6.0, STEPS, perturb=1.0, key=k)[None]
        rgb = fused_plain_hash_render_train(p, rays, ts, steps=STEPS,
                                            t_near=2.0, t_far=6.0)[:, :3]
      elif fused and kind == "coarse_fine":
        from nerf_atlas_tpu.ops.pallas.render import fused_coarse_fine_train
        k_ts, k_pdf = jax.random.split(k)
        ts = rays_ops.compute_ts(2.0, 6.0, STEPS, perturb=1.0,
                                 key=k_ts)[None]
        fine, coarse = fused_coarse_fine_train(
            p, rays, ts, k_pdf, enc_kind="cp", steps=STEPS,
            fine_steps=STEPS, t_near=2.0, t_far=6.0)
        return (jnp.mean((fine[:, :3] - target) ** 2)
                + jnp.mean((coarse[:, :3] - target) ** 2))
      else:
        rgb = model.apply(p, rays, train=True, rngs={"sampler": k},
                          **kwargs)["rgb"]
      return jnp.mean((rgb - target) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state)
    return optax.apply_updates(params, updates), opt_state, loss

  k = jax.random.PRNGKey(2)
  p, s = params, opt_state
  p, s, l = step(p, s, k)
  float(l)                                       # compile + warm
  t0 = time.perf_counter()
  for i in range(n):
    p, s, l = step(p, s, jax.random.fold_in(k, i))
  float(l)                                       # single device->host sync
  dt = time.perf_counter() - t0
  return n * TRAIN_BATCH / dt


def bench_config_render(kind, n_rays=262_144, chunk=65_536, reps=2):
  """Eval-render rays/s for one canonical config through the XLA path."""
  model, needs_times = _config_model(kind)
  rays = _frame_rays()[:n_rays]
  times = jnp.linspace(0.0, 1.0, rays.shape[0])
  kwargs = {"times": times[:256]} if needs_times else {}
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays[:256],
                      train=True, **kwargs)

  @jax.jit
  def render(params, rc, tc, acc):
    kw = {"times": tc} if needs_times else {}
    out = model.apply(params, rc, **kw)["rgb"]
    return acc + jnp.sum(out)

  chunks = [(rays[i:i + chunk], times[i:i + chunk])
            for i in range(0, rays.shape[0], chunk)]
  float(render(params, chunks[0][0], chunks[0][1], jnp.float32(0)))
  t0 = time.perf_counter()
  acc = jnp.float32(0)
  for _ in range(reps):
    for rc, tc in chunks:
      acc = render(params, rc, tc, acc)
  float(acc)
  dt = (time.perf_counter() - t0) / reps
  return rays.shape[0] / dt


# Per-config sweep order: most informative first, so a budget cut loses
# the least. "hash" leads because it is the reference's DEFAULT encoder.
CONFIG_ORDER = ("hash", "tiny", "posenc", "mip", "volsdf", "ae", "dnerf",
                "dnerf_spline", "coarse_fine", "hash_ref19")
# kinds that also get an XLA-oracle train + render measurement
ORACLE_KINDS = ("tiny", "ae", "volsdf", "dnerf", "hash", "hash_ref19")


def bench_config_render_fused_hash(n_rays=262_144, reps=2):
  """Eval-render rays/s for the TPU-fast hash envelope through the FUSED
  path (fused_plain_hash_render: one-hot MXU encode + fused downstream
  kernel) — the path the driver's eval gate engages for T <= 2^16.
  Host-loops one compiled <=2^19-point chunk (the driver's eval chunking
  — bigger single jits unroll kernel pairs for minutes of remote
  compile, and lax.map scoped-vmem-OOMs; see render.py)."""
  from nerf_atlas_tpu.ops.pallas.hash_encode import _MAX_SINGLE_PTS
  from nerf_atlas_tpu.ops.pallas.render import fused_plain_hash_render
  model, _ = _config_model("hash")
  chunk = _MAX_SINGLE_PTS // STEPS
  rays = _frame_rays()[:n_rays]
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays[:256],
                      train=True)

  render = jax.jit(lambda p, r: jnp.sum(
      fused_plain_hash_render(p, r, steps=STEPS)))
  chunks = [rays[i:i + chunk] for i in range(0, n_rays, chunk)]
  float(render(params, chunks[0]))
  t0 = time.perf_counter()
  for _ in range(reps):
    acc = 0.0
    for rc in chunks:
      acc += float(render(params, rc))
  dt = (time.perf_counter() - t0) / reps
  return n_rays / dt


def _config_entry(kind, baseline_table):
  """Measure one canonical config; returns its bench row."""
  entry = {}
  try:
    if kind in ORACLE_KINDS:
      entry["train_rays_per_sec"] = round(bench_config_train(kind), 1)
      entry["render_rays_per_sec"] = round(bench_config_render(kind), 1)
  except Exception as e:  # noqa: BLE001
    entry["error"] = f"{type(e).__name__}: {e}"
  try:
    entry["train_rays_per_sec_fused"] = round(
        bench_config_train(kind, fused=True), 1)
  except Exception as e:  # noqa: BLE001
    entry["fused_error"] = f"{type(e).__name__}: {e}"
  if kind == "hash":
    # the driver's EVAL gate also serves this envelope fused
    # (train/driver.py:1108-1110); record that path's number too
    try:
      entry["render_rays_per_sec_fused"] = round(
          bench_config_render_fused_hash(), 1)
    except Exception as e:  # noqa: BLE001
      entry["render_fused_error"] = f"{type(e).__name__}: {e}"
  if kind in ("mip", "coarse_fine"):
    # BASELINE config #2 rows: the reference's hierarchical sampler is
    # broken upstream (exit() at src/nerf.py:1772), so their baseline
    # is the reference's plain recipe
    entry["baseline_note"] = "vs the reference's plain recipe"
  ref = baseline_table.get(
      "plain" if kind in ("mip", "coarse_fine", "posenc", "hash",
                          "hash_ref19")
      else ("dnerf" if kind == "dnerf_spline" else kind))
  best = (entry.get("train_rays_per_sec_fused")
          or entry.get("train_rays_per_sec"))
  if isinstance(ref, (int, float)) and best:
    entry["train_vs_baseline"] = round(best / ref, 2)
  return entry


def main():
  t_start = time.perf_counter()
  budget = float(os.environ.get("BENCH_BUDGET_SEC", "1500"))
  repo = os.path.dirname(os.path.abspath(__file__))
  side_file = os.path.join(repo, "BENCH_CONFIGS.json")

  model = _flagship(jnp.bfloat16)
  rays = _frame_rays()
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays[:256],
                      train=True)

  render_rps = bench_render(params, rays)
  try:
    train_fused = bench_train(params, fused=True, one_kernel=True)
    train_fused_2k = bench_train(params, fused=True)
  except Exception as e:  # noqa: BLE001
    print(f"# fused train kernel unavailable: {type(e).__name__}: {e}",
          flush=True)
    train_fused = train_fused_2k = None
  train_xla = bench_train(params, fused=False)

  baseline, baseline_src = _baseline()
  headline = {
      "metric": "rays/sec/chip, real 800x800 frame, PlainNeRF-CP 64 steps",
      "value": round(render_rps, 1),
      "unit": "rays/s",
      "vs_baseline": round(render_rps / baseline, 2),
      "baseline_rays_per_sec": baseline,
      "baseline_source": baseline_src,
      "train_rays_per_sec_fused": (None if train_fused is None
                                   else round(train_fused, 1)),
      "train_rays_per_sec_fused_2kernel": (None if train_fused_2k is None
                                           else round(train_fused_2k, 1)),
      "train_rays_per_sec_xla": round(train_xla, 1),
      "train_vs_baseline": (None if train_fused is None
                            else round(train_fused / baseline, 2)),
  }
  # The headline goes out IMMEDIATELY so a timeout during the per-config
  # sweep cannot lose the round's primary metric (BENCH_r03 lesson: the
  # old all-at-the-end print died with rc=124 and captured nothing).
  print(json.dumps(headline), flush=True)

  try:
    with open(os.path.join(repo, "BASELINE.json")) as f:
      ref_table = json.load(f)["measured_reference"].get(
          "per_config_rays_per_sec", {})
  except Exception:  # noqa: BLE001
    ref_table = {}

  configs, skipped = {}, []
  max_config_sec = 0.0
  for kind in CONFIG_ORDER:
    elapsed = time.perf_counter() - t_start
    # skip if the slowest config so far would not fit in what remains
    # (cold compiles make single configs minutes-long; dying mid-config
    # loses its row AND the final summary line)
    if elapsed + max(60.0, 1.2 * max_config_sec) > budget:
      skipped = [k for k in CONFIG_ORDER
                 if k not in configs and k != kind] + [kind]
      skipped = list(dict.fromkeys(skipped))
      print(f"# budget {budget:.0f}s reached at {elapsed:.0f}s; "
            f"skipping {skipped}", flush=True)
      break
    t0 = time.perf_counter()
    configs[kind] = _config_entry(kind, ref_table)
    max_config_sec = max(max_config_sec, time.perf_counter() - t0)
    # flush incrementally: a stdout comment line + a side artifact, so a
    # mid-sweep kill still leaves every completed row on disk
    print(f"# config {kind}: {json.dumps(configs[kind])}", flush=True)
    try:
      with open(side_file, "w") as f:
        json.dump({"headline": headline, "configs": configs,
                   "pending": [k for k in CONFIG_ORDER
                               if k not in configs]}, f, indent=1)
    except OSError:
      pass

  # Final combined line LAST: on a clean run the driver's tail ends with
  # the full result; on a timeout it ends with the headline above.
  print(json.dumps({**headline, "configs": configs, "skipped": skipped}))


if __name__ == "__main__":
  main()
