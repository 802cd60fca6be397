"""Fused NGP hash-grid encode as an MXU one-hot kernel (custom VJP).

The reference's default PlainNeRF encoder is an 8-level XOR-prime hash
grid (/root/reference/src/neural_blocks.py:92-193). Gathers are the
wrong primitive for a TPU: measured on v5e (scripts/bench_hash_gather.py
+ the round-4 Mosaic probes recorded in BENCH_NOTES.md),

  * XLA's gather runs ~63M lookups/s regardless of table size (a
    scalar-loop bound) — 1.19 s of gather per 8192-ray train step, the
    6.8k rays/s wall the round-3 hybrid hit;
  * Mosaic's only vector gather (`tpu.dynamic_gather`) lowers solely as
    single-vreg shuffles: lane-dim gather requires exactly 128 lanes,
    f32, and ≤2048 rows per call (measured envelope — 16384 rows and
    any bf16 operand crash the compile helper); sublane-dim gather
    compiles only at [8, 128]. A general VMEM gather is NOT
    expressible, so a "table in VMEM, vector gather" kernel cannot be
    built on this toolchain.

The TPU-native formulation used here makes the lookup a MATMUL:
  stage 1  one-hot over table ROWS: oh[p, s] = (idx_p >> 7 == s), then
           rows = oh @ table_rows — an MXU contraction that fetches each
           item's 128-entry table row;
  stage 2  lane select as a lane-one-hot masked multiply + lane
           reduction (measured faster than the ≤2048-row
           `dynamic_gather` envelope, and shape-unconstrained).
Cost is O(T·F) FLOPs per lookup — cheap on the MXU for T ≤ 2^16. The
BACKWARD needs no scatter at all: d(table) = ohᵀ @ (lane-one-hot · w·g)
— the same matmul transposed.

Index/weight math lives OUTSIDE the kernel. A Mosaic vreg is [8, 128]:
any op on an [8B, 1] column costs exactly as many vreg passes as an
[8B, 128] op, so the ~20 int/float ops per (level, corner) that the
hash math needs are 20 full-width passes if done in-kernel — measured
to DOMINATE the kernel (the backward ran at a T-independent ~126 ms,
and T=2^14 ran slower than 2^16). XLA computes (row, lane, weight) for
all levels × corners in wide fused elementwise kernels (~0.4 GB of HBM
streams ≈ sub-ms at v5e bandwidth) and hands the kernel corner-major
packed arrays; the kernel keeps only wide broadcast-compares, the MXU
matmuls, and the masked reductions.

Kernel layout rules learned from the Mosaic lowering (round 4):
  * NO cross-dimension reshapes ([8, B] -> [8B, 1] moves lanes to
    sublanes — the same unsupported shapecast as render.py's
    `_flatten_bt` note) — the 8 trilinear corners are FOLDED INTO THE
    ROWS (corner-major: row = c·B + b) by XLA-side packing, so blocks
    slice contiguous [8B, L] tiles;
  * NO `arr[None, :, i]`-style indexing (jnp lowers it through a
    gather primitive Mosaic rejects) — only static 2-D slices;
  * per-corner REDUCTIONS are 8 static sublane slices + adds.

Semantics exactly match nn.encoders.HashEncoder (same resolutions
schedule, dense-level direct indexing, corner clamping, XOR-prime hash,
% T wrap, trilinear weights); parity is pinned by
tests/test_pallas_hash.py (interpret) and on-chip by
tests/test_pallas_render.py's small-table fused-hash case. Gradients
flow to the TABLE only (pts get zeros — consistent with the fused
render paths' weights-only contract, ops/pallas/render.py).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# NGP hash primes (public constants from the Instant-NGP paper); stored
# as wrapped numpy int32 literals — int32 multiply/xor have the same low
# 32 bits as the reference's uint32 math.
_P0 = np.int32(1)
_P1 = np.int32(2654435761 - (1 << 32))
_P2 = np.int32(805459861)

# largest table the one-hot formulation stays fast for ([8B, S] one-hot
# with S = T/128 rows; S ≤ 512 keeps stage 1 a thin MXU matmul)
MAX_ONEHOT_TABLE = 1 << 16
# 8·block rows per one-hot matmul (both stages are matmul/mask/reduce —
# no gather envelope constrains the block size; 2048 crashes the v5e
# compile helper, 1024 compiles)
DEFAULT_BLOCK_PTS = 1024
DEFAULT_BWD_BLOCK_PTS = 1024
# Streaming bounds for the packed-array working set (see hash_encode):
# point batches up to _MAX_SINGLE_PTS run as ONE direct kernel call
# (the train step's 8192x64 = 2^19 points — measured fine, no map); a
# bigger batch streams through lax.map in pieces of _MAP_PIECE_PTS.
# The piece size is 2^17, NOT 2^19: inside a lax.map body XLA
# materializes the packed index/weight arrays as a SCOPED (stack)
# allocation for the pallas call, and the v5e scoped-vmem limit is
# 16 MB — a 2^19-point piece needs a measured 25 MB there and kills
# every eval render that streams pieces ("Ran out of memory in memory
# space vmem ... closed_call", the crash that emptied QUALITY_r04's
# plain_hash row). Direct (non-mapped) calls don't use scoped stack
# for these operands and are unaffected.
_MAX_SINGLE_PTS = 1 << 19
_MAP_PIECE_PTS = 1 << 17


def _resolutions(levels: int, base_res: int, max_res: int) -> list[int]:
  if levels == 1:
    return [base_res]
  growth = math.exp((math.log(max_res) - math.log(base_res))
                    / (levels - 1))
  return [int(round(base_res * growth ** i)) for i in range(levels)]


def _idx_w_all(pts, resolutions, T, bbox_min, bbox_max):
  """XLA-side index/weight math for every (corner, level): pts [P, 3]
  -> (idx [8, L, P] int32, w [8, L, P] f32), matching HashEncoder
  exactly (clamped corners, dense direct indexing for res³ ≤ T,
  XOR-prime hash, % T wrap, trilinear weights). Corner c pairs bits
  (c&1, c>>1&1, c>>2&1) with (x, y, z).

  All arithmetic runs on FLAT [P] vectors with python-int corner bits:
  a [P, 8]-shaped op occupies 8 of 128 lanes per vreg (16× padding
  waste) and the padded form measured ~55 ms per 524k-point step on
  v5e — the flat form is a few ms of fully-packed elementwise work."""
  xn = jnp.clip((pts - bbox_min) / (bbox_max - bbox_min), 0.0, 1.0)
  x, y, z = xn[:, 0], xn[:, 1], xn[:, 2]                   # [P] flat
  idxs = [[None] * len(resolutions) for _ in range(8)]
  ws = [[None] * len(resolutions) for _ in range(8)]
  for li, res in enumerate(resolutions):
    rmax = res - 1
    dense = res ** 3 <= T
    vx, vy, vz = x * rmax, y * rmax, z * rmax
    lox, loy, loz = jnp.floor(vx), jnp.floor(vy), jnp.floor(vz)
    frx, fry, frz = vx - lox, vy - loy, vz - loz
    gfx, gfy, gfz = 1.0 - frx, 1.0 - fry, 1.0 - frz
    lix = lox.astype(jnp.int32)
    liy = loy.astype(jnp.int32)
    liz = loz.astype(jnp.int32)
    for c in range(8):
      bx, by, bz = c & 1, (c >> 1) & 1, (c >> 2) & 1       # python ints
      cx = jnp.minimum(lix + 1, rmax) if bx else lix
      cy = jnp.minimum(liy + 1, rmax) if by else liy
      cz = jnp.minimum(liz + 1, rmax) if bz else liz
      if dense:
        idx = (cz * res + cy) * res + cx
      else:
        idx = (cx * _P0) ^ (cy * _P1) ^ (cz * _P2)
      idxs[c][li] = idx & (T - 1)
      ws[c][li] = ((frx if bx else gfx) * (fry if by else gfy)
                   * (frz if bz else gfz))
  stack = lambda rows: jnp.stack([jnp.stack(r) for r in rows])
  return stack(idxs), stack(ws)


def _pack_corner_major(a, block):
  """[8, C, P] -> [8P, C] with row = blk·8B + c·B + b, so a grid block
  i slices rows [i·8B, (i+1)·8B): corner-major WITHIN each block."""
  _, C, P = a.shape
  nb = P // block
  a = a.reshape(8, C, nb, block)
  a = jnp.transpose(a, (2, 0, 3, 1))
  return a.reshape(nb * 8 * block, C)


def _hash_fwd_kernel(hi_ref, lo_ref, w_ref, tab_ref, out_ref, *,
                     block_pts, levels, table_size, features):
  """Per level: ONE broadcast-compare one-hot [8B, S], ONE MXU matmul
  [8B, S] @ [S, 128F] (row fetch for all 8 corners of every point),
  a lane-one-hot masked multiply for the lane select, a wide sliced-add
  trilinear corner fold to [B, 128F], and an MXU matmul against a
  static per-feature lane selector for the lane reduction. All inputs
  are precomputed wide by XLA, and NO full-width vector reduction ever
  runs: the measured ablation (BENCH_NOTES round-4 study) put the
  per-(level, feature) [8B, 128] `jnp.sum(axis=1)` reductions at ~100ms
  of a 142ms step; this form measures 43ms. Large fused ops keep the
  Mosaic schedule small (a 64-way unrolled per-corner form compiled
  for >35 min — BENCH_NOTES)."""
  B, S, F = block_pts, table_size // 128, features
  sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8 * B, S), 1)
  lanes = jax.lax.broadcasted_iota(jnp.int32, (8 * B, 128), 1)
  # static lane->feature selector: sel[128f + l, f] = 1
  fsel = (jax.lax.broadcasted_iota(jnp.int32, (128 * F, F), 0) // 128
          == jax.lax.broadcasted_iota(jnp.int32, (128 * F, F), 1)
          ).astype(jnp.float32)
  cols = []
  for li in range(levels):
    oh = (hi_ref[:, li:li + 1] == sub_iota).astype(jnp.bfloat16)
    rows = jax.lax.dot_general(
        oh, tab_ref[li],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [8B, 128F]
    lsel = lo_ref[:, li:li + 1] == lanes               # [8B, 128]
    mw = jnp.where(lsel, w_ref[:, li:li + 1], 0.0)     # [8B, 128]
    parts = [rows[:, 128 * f:128 * (f + 1)] * mw for f in range(F)]
    m = jnp.concatenate(parts, axis=1)                 # [8B, 128F]
    acc = m[0:B]
    for c in range(1, 8):
      acc = acc + m[c * B:(c + 1) * B]                 # [B, 128F]
    cols.append(jax.lax.dot_general(
        acc, fsel, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        # HIGHEST = full-f32 passes: the default single bf16 pass
        # rounds the trilinear-weighted sums to ~1e-3 (measured)
        precision=jax.lax.Precision.HIGHEST))          # [B, F]
  out_ref[...] = jnp.concatenate(cols, axis=1)


def _hash_bwd_kernel(hi_ref, lo_ref, wg_ref, dtab_ref, *, block_pts,
                     levels, table_size, features):
  """d(table rows) += ohᵀ @ (lane-one-hot · w·g) — scatter-free, one
  transposed matmul per level with corners folded into the rows. The
  w·g products arrive precomputed ([8B, L·F], XLA-side)."""
  B, S, F = block_pts, table_size // 128, features

  @pl.when(pl.program_id(0) == 0)
  def _zero():
    dtab_ref[...] = jnp.zeros(dtab_ref.shape, dtab_ref.dtype)

  sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8 * B, S), 1)
  lanes = jax.lax.broadcasted_iota(jnp.int32, (8 * B, 128), 1)
  for li in range(levels):
    oh = (hi_ref[:, li:li + 1] == sub_iota).astype(jnp.bfloat16)
    lsel = lo_ref[:, li:li + 1] == lanes               # [8B, 128]
    vals = [jnp.where(lsel, wg_ref[:, li * F + f:li * F + f + 1], 0.0)
            for f in range(F)]                         # F × [8B, 128]
    val = jnp.concatenate(vals, axis=-1).astype(jnp.bfloat16)
    dtab_ref[li] = dtab_ref[li] + jax.lax.dot_general(
        oh, val, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [S, 128F]


def _table_rows(table, levels, table_size, features):
  """Model-layout table [L*T, F] -> kernel layout [L, T/128, 128*F]
  bf16 (entry t of level l -> row t>>7, lanes (t&127) + 128*f)."""
  L, T, F = levels, table_size, features
  t4 = table.reshape(L, T // 128, 128, F)
  return (jnp.transpose(t4, (0, 1, 3, 2))
          .reshape(L, T // 128, F * 128)[:, :, :]
          .astype(jnp.bfloat16))


def _rows_to_table(rows_f32, levels, table_size, features):
  """Transpose of _table_rows for the gradient (f32 in, f32 out)."""
  L, T, F = levels, table_size, features
  r4 = rows_f32.reshape(L, T // 128, F, 128)
  return jnp.transpose(r4, (0, 1, 3, 2)).reshape(L * T, F)


def _fwd_call(tab_rows, hi8, lo8, w8, *, block_pts, levels, table_size,
              features, interpret):
  P8 = hi8.shape[0]
  P = P8 // 8
  assert P % block_pts == 0, (P, block_pts)
  S = table_size // 128
  kernel = functools.partial(
      _hash_fwd_kernel, block_pts=block_pts, levels=levels,
      table_size=table_size, features=features)
  wide = pl.BlockSpec((8 * block_pts, levels), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
  return pl.pallas_call(
      kernel,
      grid=(P // block_pts,),
      in_specs=[
          wide, wide, wide,
          pl.BlockSpec((levels, S, 128 * features), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((block_pts, levels * features),
                             lambda i: (i, 0), memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((P, levels * features), jnp.float32),
      interpret=interpret,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
  )(hi8, lo8, w8, tab_rows)


def _bwd_call(hi8, lo8, wg8, *, block_pts, levels, table_size, features,
              interpret):
  block_pts = min(block_pts, DEFAULT_BWD_BLOCK_PTS)
  P8 = hi8.shape[0]
  P = P8 // 8
  assert P % block_pts == 0, (P, block_pts)
  S = table_size // 128
  kernel = functools.partial(
      _hash_bwd_kernel, block_pts=block_pts, levels=levels,
      table_size=table_size, features=features)
  wide = pl.BlockSpec((8 * block_pts, levels), lambda i: (i, 0),
                      memory_space=pltpu.VMEM)
  return pl.pallas_call(
      kernel,
      grid=(P // block_pts,),
      in_specs=[
          wide, wide,
          pl.BlockSpec((8 * block_pts, levels * features),
                       lambda i: (i, 0), memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((levels, S, 128 * features),
                             lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((levels, S, 128 * features),
                                     jnp.float32),
      interpret=interpret,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
  )(hi8, lo8, wg8)


@functools.lru_cache(maxsize=8)
def _make_hash_encode(levels, table_size, features, resolutions,
                      bbox_min, bbox_max, block_pts, interpret):
  """Custom-VJP hash encode: (table [L*T, F], pts [P, 3]) -> [P, L*F].
  Gradient reaches the table only (pts cotangent is zeros)."""

  kw = dict(block_pts=block_pts, levels=levels, table_size=table_size,
            features=features, interpret=interpret)

  def _packed(pts):
    idx, w = _idx_w_all(pts, resolutions, table_size, bbox_min, bbox_max)
    hi8 = _pack_corner_major(idx >> 7, block_pts)
    lo8 = _pack_corner_major(idx & 127, block_pts)
    w8 = _pack_corner_major(w, block_pts)
    return hi8, lo8, w8

  @jax.custom_vjp
  def encode(table, pts):
    rows = _table_rows(table, levels, table_size, features)
    return _fwd_call(rows, *_packed(pts), **kw)

  def fwd(table, pts):
    return encode(table, pts), pts

  def bwd(pts, g):
    # recompute the packed indices (6 MB of residuals beats 400 MB)
    hi8, lo8, w8 = _packed(pts)
    P = pts.shape[0]
    nb = P // block_pts
    g8 = jnp.broadcast_to(
        g.reshape(nb, 1, block_pts, levels * features),
        (nb, 8, block_pts, levels * features)
    ).reshape(8 * P, levels * features)
    wg8 = jnp.repeat(w8, features, axis=1) * g8
    drows = _bwd_call(hi8, lo8, wg8, **kw)
    dtable = _rows_to_table(drows, levels, table_size, features)
    return dtable, jnp.zeros_like(pts)

  encode.defvjp(fwd, bwd)
  return encode


def hash_encode(table, pts, *, levels: int = 8,
                table_size: int | None = None, features: int | None = None,
                base_res: int = 16, max_res: int = 2048,
                bbox_min: float = -1.0, bbox_max: float = 1.0,
                block_pts: int = DEFAULT_BLOCK_PTS,
                interpret: bool = False):
  """Fused hash-grid encode. table [L*T, F] (HashEncoder layout), pts
  [P, 3] -> features [P, L*F] f32. table_size/features default from the
  table's shape given `levels`."""
  if features is None:
    features = table.shape[-1]
  if table_size is None:
    table_size = table.shape[0] // levels
  assert table_size % 128 == 0 and table_size <= MAX_ONEHOT_TABLE, (
      "one-hot hash kernel supports T in [128, 2^16]; larger tables take "
      "the XLA-gather hybrid (see BENCH_NOTES.md for the measured bound)",
      table_size)
  res = tuple(_resolutions(levels, base_res, max_res))
  if table_size > (1 << 14) and block_pts > 512:
    # S > 128 doubles the one-hot/rows working set per row; 1024-pt
    # blocks at S = 512 blow the v5e scoped-VMEM stack (compile-helper
    # crash) — halve the block instead of failing
    block_pts = 512
  enc = _make_hash_encode(levels, table_size, features, res,
                          float(bbox_min), float(bbox_max), block_pts,
                          interpret)
  P = pts.shape[0]
  # The corner-major packed arrays are [8P, L] with L ≈ 8 lanes of a
  # 128-lane tile: their HBM footprint (and the pack-transpose temps) is
  # 16× the logical bytes. At the train batch (≤2^19 points) that is a
  # few GB and measured fine; a 65536-ray render chunk (4.2M points) hit
  # 50 GB and OOM'd the 16 GB chip (QUALITY r4 sweep). Cap the working
  # set by streaming pieces of ≤2^19 points through lax.map — the train
  # step stays single-piece, eval renders serialize pieces (the table
  # cotangent sums across pieces via map's transpose).
  piece = _MAP_PIECE_PTS
  if P > _MAX_SINGLE_PTS:
    pad = (-P) % piece
    if pad:
      pts = jnp.concatenate(
          [pts, jnp.zeros((pad, pts.shape[1]), pts.dtype)], axis=0)
    out = jax.lax.map(lambda ps: enc(table, ps),
                      pts.reshape(-1, piece, pts.shape[1]))
    return out.reshape(-1, out.shape[-1])[:P]
  pad = (-P) % block_pts
  if pad:
    pts = jnp.concatenate(
        [pts, jnp.zeros((pad, pts.shape[1]), pts.dtype)], axis=0)
  out = enc(table, pts)
  return out[:P] if pad else out
