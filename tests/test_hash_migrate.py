"""Hash-table migration (nn.encoders.resample_hash_table) parity.

The 2^19 compatibility envelope -> 2^14 fast envelope projection must
be exact where it can be (levels dense on both sides) and match the
brute-force scatter-mean definition everywhere else.
"""
import numpy as np

from nerf_atlas_tpu.nn.encoders import _PRIMES, resample_hash_table

P0, P1, P2 = (np.uint32(p) for p in _PRIMES)


def _brute(table, src_T, dst_T, levels, features, resolutions):
  out = np.zeros((levels * dst_T, features), np.float32)
  for li, res in enumerate(resolutions):
    sums = np.zeros((dst_T, features), np.float64)
    counts = np.zeros(dst_T, np.int64)
    for cz in range(res):
      for cy in range(res):
        for cx in range(res):
          cu = (np.uint32(cx), np.uint32(cy), np.uint32(cz))
          dense = (cu[2] * np.uint32(res) + cu[1]) * np.uint32(res) + cu[0]
          hashed = (cu[0] * P0) ^ (cu[1] * P1) ^ (cu[2] * P2)
          s = int((dense if res ** 3 <= src_T else hashed)
                  % np.uint32(src_T))
          d = int((dense if res ** 3 <= dst_T else hashed)
                  % np.uint32(dst_T))
          sums[d] += table[li * src_T + s]
          counts[d] += 1
      # (no early exit: full enumeration)
    nz = counts > 0
    out[li * dst_T:(li + 1) * dst_T][nz] = (
        sums[nz] / counts[nz, None]).astype(np.float32)
  return out


def _resolutions(levels, base, maxr):
  import math
  if levels == 1:
    return [base]
  g = math.exp((math.log(maxr) - math.log(base)) / (levels - 1))
  return [int(round(base * g ** i)) for i in range(levels)]


def test_matches_bruteforce():
  levels, src_T, dst_T, F = 3, 4096, 1024, 2
  base, maxr = 8, 32            # res [8, 16, 32]: dense-both, dense-src-
  #                               only, hashed-both — all three regimes
  rng = np.random.RandomState(0)
  table = rng.randn(levels * src_T, F).astype(np.float32)
  got = resample_hash_table(table, src_T, dst_T, levels=levels,
                            features=F, base_res=base, max_res=maxr)
  want = _brute(table, src_T, dst_T, levels, F,
                _resolutions(levels, base, maxr))
  np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_dense_both_sides_copies_exactly():
  """res^3 <= min(T_src, T_dst): the level is injective on both sides —
  every vertex entry copies bit-exactly, untouched entries stay zero."""
  levels, src_T, dst_T, F = 1, 4096, 1024, 2
  res = 8                       # 512 vertices <= 1024
  rng = np.random.RandomState(1)
  table = rng.randn(src_T, F).astype(np.float32)
  got = resample_hash_table(table, src_T, dst_T, levels=levels,
                            features=F, base_res=res, max_res=res)
  n = res ** 3
  np.testing.assert_array_equal(got[:n], table[:n])
  assert np.all(got[n:] == 0)


def test_constant_level_stays_constant():
  """A constant source level must migrate to the same constant on every
  touched destination entry (scatter-mean of equal values)."""
  levels, src_T, dst_T, F = 1, 2048, 256, 2
  res = 32                      # hashed on both sides
  table = np.full((src_T, F), 0.37, np.float32)
  got = resample_hash_table(table, src_T, dst_T, levels=levels,
                            features=F, base_res=res, max_res=res)
  touched = np.abs(got).sum(-1) > 0
  assert touched.any()
  np.testing.assert_allclose(got[touched], 0.37, rtol=1e-6)


def test_subsampled_estimates_mean():
  """Above the vertex cap the bucket means are estimated from a random
  subset — for a constant table the estimate is exact, and coverage
  stays high."""
  levels, src_T, dst_T, F = 1, 2048, 128, 1
  res = 64                      # 262144 vertices, cap at 8192
  table = np.full((src_T, F), -1.25, np.float32)
  got = resample_hash_table(table, src_T, dst_T, levels=levels,
                            features=F, base_res=res, max_res=res,
                            max_vertices_per_level=8192)
  touched = np.abs(got).sum(-1) > 0
  assert touched.mean() > 0.99  # 8192 draws over 128 buckets
  np.testing.assert_allclose(got[touched][:, 0], -1.25, rtol=1e-6)


def test_migrated_encoder_lossless_when_representable():
  """End-to-end: encode a point batch with the SOURCE encoder (big
  table) and with the DESTINATION encoder (migrated table). The
  dense-both level must agree exactly. For the projected level, a
  source whose vertex values are a function of the DESTINATION bucket
  (i.e. a level function representable at the destination capacity)
  must migrate losslessly — the scatter-mean averages identical values.
  (A fully random table necessarily loses ~sqrt(collision-ratio) of its
  variance — that bound is the projection itself, covered by
  test_matches_bruteforce.)"""
  import jax
  import jax.numpy as jnp
  from nerf_atlas_tpu.nn.encoders import HashEncoder

  levels, src_T, dst_T, F = 2, 4096, 1024, 2
  base, maxr = 8, 16            # res 8 (dense both) + res 16 (dense src
  #                               at 16^3 = 4096, hashed dst)
  rng = np.random.RandomState(2)
  table = rng.randn(levels * src_T, F).astype(np.float32) * 0.1
  # overwrite level 1 so every vertex value is a function of its dst
  # bucket: vertices colliding in dst carry IDENTICAL values
  res = 16
  flat = np.arange(res ** 3, dtype=np.int64)
  cz, rem = np.divmod(flat, res * res)
  cy, cx = np.divmod(rem, res)
  dense = ((cz.astype(np.uint32) * np.uint32(res) + cy.astype(np.uint32))
           * np.uint32(res) + cx.astype(np.uint32))
  hashed = ((cx.astype(np.uint32) * P0) ^ (cy.astype(np.uint32) * P1)
            ^ (cz.astype(np.uint32) * P2))
  dst_idx = (hashed % np.uint32(dst_T)).astype(np.int64)
  bucket_vals = rng.randn(dst_T, F).astype(np.float32) * 0.1
  table[src_T + dense.astype(np.int64)] = bucket_vals[dst_idx]

  migrated = resample_hash_table(table, src_T, dst_T, levels=levels,
                                 features=F, base_res=base, max_res=maxr)
  pts = jax.random.uniform(jax.random.PRNGKey(3), (256, 3),
                           jnp.float32, -1.0, 1.0)
  src_enc = HashEncoder(levels=levels, table_size=src_T, features=F,
                        base_res=base, max_res=maxr)
  dst_enc = HashEncoder(levels=levels, table_size=dst_T, features=F,
                        base_res=base, max_res=maxr)
  a = np.asarray(src_enc.apply({"params": {"table": jnp.asarray(table)}},
                               pts))
  b = np.asarray(dst_enc.apply(
      {"params": {"table": jnp.asarray(migrated)}}, pts))
  # level 0 (dense both): exact; level 1 (representable): lossless
  np.testing.assert_allclose(b, a, rtol=1e-5, atol=1e-6)
