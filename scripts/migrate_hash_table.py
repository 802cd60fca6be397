#!/usr/bin/env python3
"""Migrate a hash-encoded checkpoint between table sizes.

A PlainNeRF(enc_kind="hash") checkpoint trained at the reference's
native scale (--hash-table-log2 19, the compatibility envelope — pinned
at XLA-gather speed, ~7k train rays/s, BENCH_NOTES) is projected onto
the TPU-fast one-hot-kernel envelope (T <= 2^16, default 2^14, 63k+
rays/s) via nn.encoders.resample_hash_table: exact copy for levels
dense on both sides, scatter-mean re-hash for the rest. Everything else
in the checkpoint (MLP weights, refl) is carried over unchanged.

Usage:
  python scripts/migrate_hash_table.py IN.ckpt OUT.ckpt [--dst-log2 14]
Load the result with `--enc-kind hash --hash-table-log2 14 --load
OUT.ckpt` — the fused one-kernel hash step then auto-engages.
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def migrate(params, dst_table_size: int, levels: int = 8):
  from nerf_atlas_tpu.nn.encoders import resample_hash_table
  enc = params["params"]["density_mlp"]["enc"]
  table = np.asarray(enc["table"])
  src_table_size = table.shape[0] // levels
  features = table.shape[1]
  if src_table_size == dst_table_size:
    print(f"[migrate] table already {src_table_size} entries/level; no-op")
    return params
  enc["table"] = resample_hash_table(
      table, src_table_size, dst_table_size, levels=levels,
      features=features)
  print(f"[migrate] table {src_table_size} -> {dst_table_size} "
        f"entries/level ({levels} levels, {features} features)")
  return params


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("src", help="input checkpoint (hash-encoded model)")
  ap.add_argument("dst", help="output checkpoint path")
  ap.add_argument("--dst-log2", type=int, default=14,
                  help="log2 of the destination entries/level")
  ap.add_argument("--levels", type=int, default=8)
  args = ap.parse_args()

  from nerf_atlas_tpu.train import checkpoints
  raw = checkpoints.load(args.src)
  params = raw["params"] if "params" in raw and "step" in raw else raw
  cfg = checkpoints.load_config(args.src) or {}
  params = migrate(params, 1 << args.dst_log2, levels=args.levels)
  cfg["hash_table_log2"] = args.dst_log2
  path = checkpoints.save(args.dst, params, config=cfg,
                          step=int(raw.get("step", 0)))
  print(f"[migrate] wrote {path}; load with --enc-kind hash "
        f"--hash-table-log2 {args.dst_log2}")


if __name__ == "__main__":
  main()
