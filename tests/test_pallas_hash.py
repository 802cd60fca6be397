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
  """P above _MAX_SINGLE_PTS streams through lax.map pieces (the
  oversize-direct-call API path; the fused eval renders stay below the
  bound by construction — render.py chunking note): values AND the
  table gradient must match the unchunked path."""
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
  monkeypatch.setattr(he, "_MAX_SINGLE_PTS", 256)
  monkeypatch.setattr(he, "_MAP_PIECE_PTS", 256)
  got = run(pts)
  dgot = jax.grad(lambda t: jnp.sum(
      hash_encode(t, pts, levels=LEVELS, block_pts=256,
                  interpret=True) ** 2))(tab)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-5, atol=1e-6)
  np.testing.assert_allclose(np.asarray(dgot), np.asarray(dwant),
                             rtol=1e-5, atol=1e-6)


def test_one_kernel_step_sharded_parity():
  """Sharded ONE-kernel hash train step (round 5) vs single-chip, on the
  8-device CPU mesh, small table so the one-hot kernel path runs per
  chip in interpret mode. Loss, MLP-weight grads, AND the psum'ed table
  cotangent must match."""
  from nerf_atlas_tpu import models
  from nerf_atlas_tpu.ops.pallas.render import (
      fused_plain_hash_train_step, fused_plain_hash_train_step_sharded)
  from nerf_atlas_tpu.parallel import make_mesh

  model = models.PlainNeRF(steps=8, t_near=2.0, t_far=6.0,
                           enc_kind="hash",
                           enc_kwargs={"table_size": 1024})
  n = 128
  r_o = jnp.tile(jnp.array([[0.0, 0.0, 3.5]]), (n, 1))
  r_d = (jax.random.normal(jax.random.PRNGKey(0), (n, 3)) * 0.1
         + jnp.array([0.0, 0.0, -1.0]))
  rays = jnp.concatenate([r_o, r_d], -1)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  target = jax.random.uniform(jax.random.PRNGKey(2), (n, 3))
  mesh = make_mesh()
  kw = dict(steps=8, t_near=2.0, t_far=6.0, bwd_block_rays=16,
            interpret=True)

  ls, gs = fused_plain_hash_train_step_sharded(params, rays, target,
                                               mesh=mesh, **kw)
  l1, g1 = fused_plain_hash_train_step(params, rays, target, **kw)
  np.testing.assert_allclose(float(ls), float(l1), rtol=1e-4)
  flat_s = jax.tree_util.tree_leaves_with_path(gs)
  flat_1 = dict(jax.tree_util.tree_leaves_with_path(g1))
  for path, g_shard in flat_s:
    a = np.asarray(g_shard, np.float64)
    b = np.asarray(flat_1[path], np.float64)
    denom = max(np.linalg.norm(b), 1e-12)
    assert np.linalg.norm(a - b) / denom < 1e-3, (
        jax.tree_util.keystr(path), np.linalg.norm(a - b) / denom)
  tg = np.asarray(gs["params"]["density_mlp"]["enc"]["table"])
  assert np.isfinite(tg).all() and np.abs(tg).max() > 0
