#!/usr/bin/env python3
"""Micro-benchmark: hash-grid table lookup strategies on TPU v5e.

Decides the design of the fast NGP-hash path (VERDICT r3 missing #1):
the reference's default PlainNeRF encoder is an 8-level hash grid
(/root/reference/src/neural_blocks.py:92-193) and the round-3 hybrid
(XLA gather + fused downstream) measured 6.8k rays/s train — the gather
dominates. This sweeps lookup strategies at the real workload size
(8192 rays x 64 steps x 8 corners = 4.19M lookups PER LEVEL) so the
kernel design is measurement-driven, not guessed.

Strategies:
  A xla_take_1d      current encoder form: jnp.take on a [L*T] column
  B xla_rowgather    table as [T/128, 128] rows; row gather + VPU
                     one-hot lane select (128-lane minor dim)
  C pallas_rowgather same row gather inside a Pallas kernel, table
                     VMEM-resident (does Mosaic lower it? how fast?)
  D onehot_matmul    two-stage one-hot: [B, T/128] @ [T/128, 128F] on
                     the MXU + lane select (backward = transposed
                     matmul, also MXU — no scatter anywhere)
  S xla_scatter      the backward cost of A (gather transpose)

Run: JAX_PLATFORMS=axon python scripts/bench_hash_gather.py
"""
from __future__ import annotations

import functools
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1)
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 524_288 * 8        # lookups per level for an 8192-ray train step
F = 2                  # feature channels


def timed(fn, *args, reps=5):
  out = fn(*args)
  jax.block_until_ready(out)
  float(jnp.sum(out[0] if isinstance(out, tuple) else out))  # force remote
  t0 = time.perf_counter()
  acc = None
  for _ in range(reps):
    out = fn(*args)
    o = out[0] if isinstance(out, tuple) else out
    acc = jnp.sum(o) if acc is None else acc + jnp.sum(o)
  float(acc)
  return (time.perf_counter() - t0) / reps


def report(name, dt):
  per_level_ms = dt * 1e3
  step_ms = per_level_ms * 8  # 8 levels
  rays_s = 8192 / (step_ms / 1e3)
  print(f"{name:28s} {per_level_ms:9.2f} ms/level  "
        f"-> {step_ms:8.1f} ms/8-level step  ({rays_s:,.0f} rays/s bound)",
        flush=True)


def main():
  key = jax.random.PRNGKey(0)
  for logT in (19, 16, 14):
    T = 1 << logT
    print(f"\n=== table_size T = 2^{logT} = {T} ===", flush=True)
    tab = jax.random.normal(key, (T, F), jnp.float32)
    tab_rows = tab.reshape(T // 128, 128 * F)          # entry t -> row t>>7
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, T, jnp.int32)

    # --- A: current XLA 1-D take (per feature channel) ---
    @jax.jit
    def take1d(tab, idx):
      return jnp.stack([jnp.take(tab[:, f], idx, axis=0) for f in range(F)],
                       axis=0)
    try:
      report("A xla_take_1d", timed(take1d, tab, idx))
    except Exception as e:  # noqa: BLE001
      print(f"A xla_take_1d FAILED: {type(e).__name__}: {e}", flush=True)

    # --- B: XLA row gather (128F minor) + one-hot lane select ---
    @jax.jit
    def rowgather(tab_rows, idx):
      rows = jnp.take(tab_rows, idx >> 7, axis=0)        # [N, 128F]
      lo = (idx & 127)
      lanes = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
      sel = (lo[:, None] == lanes).astype(tab_rows.dtype)  # [N, 128]
      r = rows.reshape(-1, 128, F)
      return jnp.einsum("nl,nlf->nf", sel, r)
    try:
      report("B xla_rowgather+select", timed(rowgather, tab_rows, idx))
    except Exception as e:  # noqa: BLE001
      print(f"B xla_rowgather FAILED: {type(e).__name__}: {e}", flush=True)

    # --- C: Pallas row gather, table VMEM-resident ---
    BLK = 2048
    def pall_kernel(idx_ref, tab_ref, out_ref):
      rows = jnp.take(tab_ref[:], idx_ref[:] >> 7, axis=0)   # [BLK, 128F]
      lo = idx_ref[:] & 127
      lanes = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128), 1)
      sel = (lo[:, None] == lanes).astype(jnp.float32)
      r = rows.reshape(BLK, 128, F)
      out_ref[:] = jnp.sum(sel[..., None] * r, axis=1)

    @jax.jit
    def pall(tab_rows, idx):
      return pl.pallas_call(
          pall_kernel,
          grid=(N // BLK,),
          in_specs=[
              pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
              pl.BlockSpec((T // 128, 128 * F), lambda i: (0, 0),
                           memory_space=pltpu.VMEM),
          ],
          out_specs=pl.BlockSpec((BLK, F), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
          out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
      )(idx, tab_rows)
    try:
      report("C pallas_rowgather", timed(pall, tab_rows, idx))
    except Exception as e:  # noqa: BLE001
      print(f"C pallas_rowgather FAILED: {type(e).__name__}: "
            f"{str(e)[:300]}", flush=True)

    # --- D: two-stage one-hot matmul (MXU) ---
    S = T // 128
    tab_bf = tab_rows.astype(jnp.bfloat16)

    def onehot_kernel(idx_ref, tab_ref, out_ref):
      hi = idx_ref[:] >> 7
      subl = jax.lax.broadcasted_iota(jnp.int32, (BLK, S), 1)
      oh = (hi[:, None] == subl).astype(jnp.bfloat16)        # [BLK, S]
      rows = jnp.dot(oh, tab_ref[:],
                     preferred_element_type=jnp.float32)     # [BLK, 128F]
      lo = idx_ref[:] & 127
      lanes = jax.lax.broadcasted_iota(jnp.int32, (BLK, 128), 1)
      sel = (lo[:, None] == lanes).astype(jnp.float32)
      r = rows.reshape(BLK, 128, F)
      out_ref[:] = jnp.sum(sel[..., None] * r, axis=1)

    @jax.jit
    def onehot(tab_bf, idx):
      return pl.pallas_call(
          onehot_kernel,
          grid=(N // BLK,),
          in_specs=[
              pl.BlockSpec((BLK,), lambda i: (i,), memory_space=pltpu.VMEM),
              pl.BlockSpec((S, 128 * F), lambda i: (0, 0),
                           memory_space=pltpu.VMEM),
          ],
          out_specs=pl.BlockSpec((BLK, F), lambda i: (i, 0),
                                 memory_space=pltpu.VMEM),
          out_shape=jax.ShapeDtypeStruct((N, F), jnp.float32),
      )(idx, tab_bf)
    if logT <= 16:  # 2^19 one-hot is 70 TFLOP/step — skip, provably slow
      try:
        report("D pallas_onehot_matmul", timed(onehot, tab_bf, idx))
      except Exception as e:  # noqa: BLE001
        print(f"D pallas_onehot FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)

    # --- S: XLA scatter-add (the backward of A) ---
    @jax.jit
    def scat(idx, g):
      z = jnp.zeros((T,), jnp.float32)
      return z.at[idx].add(g)
    g = jax.random.normal(jax.random.PRNGKey(2), (N,), jnp.float32)
    try:
      report("S xla_scatter_add (bwd)", timed(scat, idx, g))
    except Exception as e:  # noqa: BLE001
      print(f"S xla_scatter FAILED: {type(e).__name__}: {e}", flush=True)

    # --- B-bwd: one-hot matmul scatter (dtab = oh.T @ val), XLA blocks ---
    def scat_mm_blk(carry, args):
      idx_b, val_b = args
      subl = jax.lax.broadcasted_iota(jnp.int32, (idx_b.shape[0], S), 1)
      oh = ((idx_b >> 7)[:, None] == subl).astype(jnp.bfloat16)
      lanes = jax.lax.broadcasted_iota(jnp.int32, (idx_b.shape[0], 128), 1)
      sel = ((idx_b & 127)[:, None] == lanes).astype(jnp.bfloat16)
      val = (sel[..., None] * val_b[:, None, :]).reshape(
          idx_b.shape[0], 128 * F).astype(jnp.bfloat16)
      return carry + jnp.dot(oh.T, val,
                             preferred_element_type=jnp.float32), None

    @jax.jit
    def scat_mm(idx, gf):
      nblk = N // 8192
      idx_b = idx.reshape(nblk, 8192)
      val_b = gf.reshape(nblk, 8192, F)
      out, _ = jax.lax.scan(scat_mm_blk,
                            jnp.zeros((S, 128 * F), jnp.float32),
                            (idx_b, val_b))
      return out
    gf = jax.random.normal(jax.random.PRNGKey(3), (N, F), jnp.float32)
    if logT <= 16:
      try:
        report("M xla_onehot_scatter (bwd)", timed(scat_mm, idx, gf))
      except Exception as e:  # noqa: BLE001
        print(f"M xla_onehot_scatter FAILED: {type(e).__name__}: "
              f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
  main()
