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

Kernel layout rules learned from the Mosaic lowering (round 4):
  * NO cross-dimension reshapes ([8, B] -> [8B, 1] moves lanes to
    sublanes — the same unsupported shapecast as render.py's
    `_flatten_bt` note) — everything lives in [8B, 1]/[8B, lanes]
    column layouts, with the 8 trilinear corners FOLDED INTO THE ROWS
    (corner-major: row = c·B + b) via a vertical concat of the point
    block;
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
# 32 bits as the reference's uint32 math, and numpy scalars inline as
# kernel constants (jnp arrays would be captured tracer constants).
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
# the backward's working set is ~2× the forward's (one-hot + lane mask
# + per-feature value buffers per level) — 1024-pt blocks blew the
# 100 MB scoped-VMEM limit on v5e (measured: 125.3 MB); 512 fits
DEFAULT_BWD_BLOCK_PTS = 512


def _resolutions(levels: int, base_res: int, max_res: int) -> list[int]:
  if levels == 1:
    return [base_res]
  growth = math.exp((math.log(max_res) - math.log(base_res))
                    / (levels - 1))
  return [int(round(base_res * growth ** i)) for i in range(levels)]


def _corner_cols(B: int):
  """Per-row corner bits for the corner-major [8B, 1] layout
  (row = c·B + b): c = row // B, (bx, by, bz) = (c&1, (c>>1)&1,
  (c>>2)&1) — the HashEncoder corner pairing. Built from iota in-trace
  (compiled pallas_call rejects captured numpy constants)."""
  c = jax.lax.broadcasted_iota(jnp.int32, (8 * B, 1), 0) // B
  return c & 1, (c >> 1) & 1, (c >> 2) & 1


def _level_idx_w(xn8, bx, by, bz, res, dense, T):
  """Table indices [8B, 1] int32 and trilinear weights [8B, 1] f32 for
  one level in the corner-major layout, matching HashEncoder exactly
  (clamped corners, dense direct indexing, XOR-prime hash, % T wrap).
  xn8 [8B, 3]: the normalized point block repeated 8× vertically."""
  v = xn8 * (res - 1)                                  # [8B, 3] f32
  lo = jnp.floor(v)
  fr = v - lo                                          # [8B, 3]
  loi = lo.astype(jnp.int32)
  rmax = res - 1
  cx = jnp.minimum(loi[:, 0:1] + bx, rmax)             # [8B, 1]
  cy = jnp.minimum(loi[:, 1:2] + by, rmax)
  cz = jnp.minimum(loi[:, 2:3] + bz, rmax)
  if dense:
    idx = (cz * res + cy) * res + cx
  else:
    idx = (cx * _P0) ^ (cy * _P1) ^ (cz * _P2)
  idx = idx & (T - 1)                                  # [8B, 1]
  fx, fy, fz = fr[:, 0:1], fr[:, 1:2], fr[:, 2:3]
  bxf, byf, bzf = (b.astype(fx.dtype) for b in (bx, by, bz))
  w = ((bxf * fx + (1 - bxf) * (1.0 - fx))
       * (byf * fy + (1 - byf) * (1.0 - fy))
       * (bzf * fz + (1 - bzf) * (1.0 - fz)))          # [8B, 1]
  return idx, w


def _hash_fwd_kernel(pts_ref, tab_ref, out_ref, *, block_pts, levels,
                     table_size, features, resolutions, bbox_min,
                     bbox_max):
  """Per level: ONE one-hot build [8B, S], ONE MXU matmul
  [8B, S] @ [S, 128F] (row fetch for all 8 corners of every point),
  then a lane-one-hot masked multiply + lane reduction for the lane
  select (the same form the backward uses — measured FASTER than
  per-corner dynamic_gathers, and free of their ≤2048-row envelope),
  and a sliced-adds trilinear corner reduction. Large fused ops keep
  the Mosaic schedule small (a 64-way unrolled per-corner form compiled
  for >35 min — BENCH_NOTES)."""
  B, S, F, T = block_pts, table_size // 128, features, table_size
  pts = pts_ref[:, 0:3]
  xn = jnp.clip((pts - bbox_min) / (bbox_max - bbox_min), 0.0, 1.0)
  xn8 = jnp.concatenate([xn] * 8, axis=0)              # [8B, 3]
  bx, by, bz = _corner_cols(B)
  sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8 * B, S), 1)
  lanes = jax.lax.broadcasted_iota(jnp.int32, (8 * B, 128), 1)
  for li in range(levels):
    res = resolutions[li]
    idx, w = _level_idx_w(xn8, bx, by, bz, res, res ** 3 <= T, T)
    oh = (idx >> 7 == sub_iota).astype(jnp.bfloat16)   # [8B, S]
    rows = jax.lax.dot_general(
        oh, tab_ref[li],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # [8B, 128F]
    lsel = (idx & 127) == lanes                        # [8B, 128]
    for f in range(F):
      m = jnp.where(lsel, rows[:, 128 * f:128 * (f + 1)], 0.0) * w
      s = jnp.sum(m, axis=1, keepdims=True)            # [8B, 1]
      acc = s[0:B]
      for c in range(1, 8):
        acc = acc + s[c * B:(c + 1) * B]
      out_ref[:, li * F + f:li * F + f + 1] = acc


def _hash_bwd_kernel(pts_ref, g_ref, dtab_ref, *, block_pts, levels,
                     table_size, features, resolutions, bbox_min,
                     bbox_max):
  """d(table rows) += ohᵀ @ (lane-one-hot · w·g) — scatter-free, one
  transposed matmul per level with corners folded into the rows."""
  B, S, F, T = block_pts, table_size // 128, features, table_size

  @pl.when(pl.program_id(0) == 0)
  def _zero():
    dtab_ref[...] = jnp.zeros(dtab_ref.shape, dtab_ref.dtype)

  pts = pts_ref[:, 0:3]
  xn = jnp.clip((pts - bbox_min) / (bbox_max - bbox_min), 0.0, 1.0)
  xn8 = jnp.concatenate([xn] * 8, axis=0)              # [8B, 3]
  bx, by, bz = _corner_cols(B)
  sub_iota = jax.lax.broadcasted_iota(jnp.int32, (8 * B, S), 1)
  lanes = jax.lax.broadcasted_iota(jnp.int32, (8 * B, 128), 1)
  for li in range(levels):
    res = resolutions[li]
    idx, w = _level_idx_w(xn8, bx, by, bz, res, res ** 3 <= T, T)
    oh = (idx >> 7 == sub_iota).astype(jnp.bfloat16)   # [8B, S]
    lsel = (idx & 127) == lanes                        # [8B, 128]
    vals = []
    for f in range(F):
      gcol = g_ref[:, li * F + f:li * F + f + 1]       # [B, 1]
      g8 = jnp.concatenate([gcol] * 8, axis=0)         # [8B, 1]
      vals.append(jnp.where(lsel, w * g8, 0.0))        # [8B, 128]
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


def _fwd_call(tab_rows, pts, *, block_pts, levels, table_size, features,
              resolutions, bbox_min, bbox_max, interpret):
  P = pts.shape[0]
  assert P % block_pts == 0, (P, block_pts)
  S = table_size // 128
  kernel = functools.partial(
      _hash_fwd_kernel, block_pts=block_pts, levels=levels,
      table_size=table_size, features=features, resolutions=resolutions,
      bbox_min=bbox_min, bbox_max=bbox_max)
  return pl.pallas_call(
      kernel,
      grid=(P // block_pts,),
      in_specs=[
          pl.BlockSpec((block_pts, 3), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((levels, S, 128 * features), lambda i: (0, 0, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((block_pts, levels * features),
                             lambda i: (i, 0), memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((P, levels * features), jnp.float32),
      interpret=interpret,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
  )(pts, tab_rows)


def _bwd_call(pts, g, *, block_pts, levels, table_size, features,
              resolutions, bbox_min, bbox_max, interpret):
  # smaller blocks than the forward: see DEFAULT_BWD_BLOCK_PTS
  block_pts = min(block_pts, DEFAULT_BWD_BLOCK_PTS)
  P = pts.shape[0]
  assert P % block_pts == 0, (P, block_pts)
  S = table_size // 128
  kernel = functools.partial(
      _hash_bwd_kernel, block_pts=block_pts, levels=levels,
      table_size=table_size, features=features, resolutions=resolutions,
      bbox_min=bbox_min, bbox_max=bbox_max)
  return pl.pallas_call(
      kernel,
      grid=(P // block_pts,),
      in_specs=[
          pl.BlockSpec((block_pts, 3), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
          pl.BlockSpec((block_pts, levels * features), lambda i: (i, 0),
                       memory_space=pltpu.VMEM),
      ],
      out_specs=pl.BlockSpec((levels, S, 128 * features),
                             lambda i: (0, 0, 0),
                             memory_space=pltpu.VMEM),
      out_shape=jax.ShapeDtypeStruct((levels, S, 128 * features),
                                     jnp.float32),
      interpret=interpret,
      compiler_params=pltpu.CompilerParams(
          vmem_limit_bytes=100 * 1024 * 1024),
  )(pts, g)


@functools.lru_cache(maxsize=8)
def _make_hash_encode(levels, table_size, features, resolutions,
                      bbox_min, bbox_max, block_pts, interpret):
  """Custom-VJP hash encode: (table [L*T, F], pts [P, 3]) -> [P, L*F].
  Gradient reaches the table only (pts cotangent is zeros)."""

  kw = dict(block_pts=block_pts, levels=levels, table_size=table_size,
            features=features, resolutions=resolutions,
            bbox_min=bbox_min, bbox_max=bbox_max, interpret=interpret)

  @jax.custom_vjp
  def encode(table, pts):
    rows = _table_rows(table, levels, table_size, features)
    return _fwd_call(rows, pts, **kw)

  def fwd(table, pts):
    return encode(table, pts), pts

  def bwd(pts, g):
    drows = _bwd_call(pts, g, **kw)
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
  enc = _make_hash_encode(levels, table_size, features, res,
                          float(bbox_min), float(bbox_max), block_pts,
                          interpret)
  P = pts.shape[0]
  pad = (-P) % block_pts
  if pad:
    pts = jnp.concatenate(
        [pts, jnp.zeros((pad, pts.shape[1]), pts.dtype)], axis=0)
  out = enc(table, pts)
  return out[:P] if pad else out
