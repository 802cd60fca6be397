"""Parity of the fused one-hot hash-encode kernel vs nn.encoders.
HashEncoder (the XLA oracle), interpret mode on CPU.

The kernel must reproduce the encoder's exact semantics (resolution
schedule, dense-level direct indexing, corner clamping, XOR-prime hash,
% T wrap, trilinear weights); the table is bf16 in-kernel, so parity is
checked against a bf16-rounded table where the one-hot matmul is exact.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf_atlas_tpu.nn.encoders import HashEncoder
from nerf_atlas_tpu.ops.pallas.hash_encode import hash_encode

LEVELS, T, F = 8, 1 << 14, 2


def _table(key):
  tab = jax.random.normal(key, (LEVELS * T, F), jnp.float32) * 0.1
  # bf16-representable values make the kernel's one-hot matmul exact
  return tab.astype(jnp.bfloat16).astype(jnp.float32)


def _pts(key, n=512):
  return jax.random.uniform(key, (n, 3), jnp.float32, -1.2, 1.2)


def _oracle(tab, pts):
  enc = HashEncoder(levels=LEVELS, table_size=T, features=F)
  return enc.apply({"params": {"table": tab}}, pts)


def test_fwd_parity_interpret():
  tab = _table(jax.random.PRNGKey(0))
  pts = _pts(jax.random.PRNGKey(1))
  want = _oracle(tab, pts)
  got = hash_encode(tab, pts, levels=LEVELS, block_pts=256,
                    interpret=True)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_fwd_parity_nondivisible_pad():
  tab = _table(jax.random.PRNGKey(0))
  pts = _pts(jax.random.PRNGKey(2), n=300)   # not a block multiple
  want = _oracle(tab, pts)
  got = hash_encode(tab, pts, levels=LEVELS, block_pts=256,
                    interpret=True)
  assert got.shape == want.shape
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-5)


def test_table_grad_parity_interpret():
  tab = _table(jax.random.PRNGKey(0))
  pts = _pts(jax.random.PRNGKey(3), n=256)
  g = jax.random.normal(jax.random.PRNGKey(4),
                        (256, LEVELS * F), jnp.float32)
  # bf16-exact cotangents keep the backward matmul exact too
  g = g.astype(jnp.bfloat16).astype(jnp.float32)

  def loss_oracle(t):
    return jnp.sum(_oracle(t, pts) * g)

  def loss_kernel(t):
    return jnp.sum(hash_encode(t, pts, levels=LEVELS, block_pts=256,
                               interpret=True) * g)

  want = jax.grad(loss_oracle)(tab)
  got = jax.grad(loss_kernel)(tab)
  # the trilinear weight enters the bf16 product in the kernel backward
  # (w·g rounded to bf16) — tolerance is the bf16 rounding floor
  w, gt = np.asarray(want), np.asarray(got)
  denom = np.abs(w).max()
  np.testing.assert_allclose(gt, w, atol=denom * 8e-3)
  # gradient sparsity structure must match exactly
  assert ((np.abs(w) > 0) == (np.abs(gt) > 0)).mean() > 0.999


def test_pts_get_zero_grad():
  tab = _table(jax.random.PRNGKey(0))
  pts = _pts(jax.random.PRNGKey(5), n=256)
  dpts = jax.grad(
      lambda p: jnp.sum(hash_encode(tab, p, levels=LEVELS,
                                    block_pts=256, interpret=True)))(pts)
  assert float(jnp.abs(dpts).max()) == 0.0


def test_table_size_gate():
  tab = jnp.zeros((8 * (1 << 17), 2), jnp.float32)
  with pytest.raises(AssertionError):
    hash_encode(tab, jnp.zeros((256, 3)), levels=8, interpret=True)


def test_piecewise_map_path_matches_unchunked(monkeypatch):
  """P above _MAX_PIECE_PTS streams through lax.map pieces (the OOM fix
  for big eval-render chunks): values AND the table gradient must match
  the unchunked path."""
  from nerf_atlas_tpu.ops.pallas import hash_encode as he
  tab = _table(jax.random.PRNGKey(0))
  pts = _pts(jax.random.PRNGKey(7), n=1000)  # non-multiple of the piece

  def run(p):
    return hash_encode(tab, p, levels=LEVELS, block_pts=256,
                       interpret=True)

  want = run(pts)
  dwant = jax.grad(lambda t: jnp.sum(
      hash_encode(t, pts, levels=LEVELS, block_pts=256,
                  interpret=True) ** 2))(tab)
  monkeypatch.setattr(he, "_MAX_PIECE_PTS", 256)
  got = run(pts)
  dgot = jax.grad(lambda t: jnp.sum(
      hash_encode(t, pts, levels=LEVELS, block_pts=256,
                  interpret=True) ** 2))(tab)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(np.asarray(dgot), np.asarray(dwant),
                             rtol=1e-5, atol=1e-6)
