"""Fused Pallas render kernel vs the pure-JAX oracle (interpret mode):
forward parity AND gradient parity (the custom-VJP backward kernel)."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_atlas_tpu import models
from nerf_atlas_tpu.ops.pallas import fused_plain_cp_render
from nerf_atlas_tpu.ops.pallas.render import (
    fused_plain_cp_render_train, fused_plain_mip_render_train)
import pytest

pytestmark = pytest.mark.slow  # interpret-mode Pallas kernels


@pytest.mark.parametrize("enc_kind", ["cp", "posenc"])
def test_fused_render_matches_oracle(enc_kind):
  model = models.PlainNeRF(steps=16, t_near=2.0, t_far=6.0,
                           enc_kind=enc_kind)
  n = 64
  key = jax.random.PRNGKey(0)
  r_o = jnp.tile(jnp.array([[0.0, 0, 3.5]]), (n, 1))
  r_d = jax.random.normal(key, (n, 3)) * 0.2 + jnp.array([0.0, 0, -1.0])
  rays = jnp.concatenate([r_o, r_d], -1)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  oracle = model.apply(params, rays)
  fused = fused_plain_cp_render(params, rays, steps=16, t_near=2.0,
                                t_far=6.0, block_rays=32, interpret=True,
                                enc_kind=enc_kind)
  np.testing.assert_allclose(np.asarray(fused[:, :3]),
                             np.asarray(oracle["rgb"]), atol=2e-2)
  acc = oracle["weights"].sum(-1)
  np.testing.assert_allclose(np.asarray(fused[:, 3]), np.asarray(acc),
                             atol=2e-2)


@pytest.mark.parametrize("enc_kind", ["cp", "posenc"])
def test_fused_render_grad_matches_oracle(enc_kind):
  """Backward kernel (custom VJP) vs jax.grad through the XLA oracle."""
  model = models.PlainNeRF(steps=16, t_near=2.0, t_far=6.0,
                           enc_kind=enc_kind)
  n = 32
  key = jax.random.PRNGKey(3)
  r_o = jnp.tile(jnp.array([[0.0, 0, 3.5]]), (n, 1))
  r_d = jax.random.normal(key, (n, 3)) * 0.2 + jnp.array([0.0, 0, -1.0])
  rays = jnp.concatenate([r_o, r_d], -1)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  target = jax.random.uniform(jax.random.PRNGKey(5), (n, 3))

  # the opacity term makes the density-path gradients first-order (with
  # an RGB-only loss on a random init they are ~1e-6 noise and the
  # relative comparison is meaningless)
  def loss_fused(p):
    out = fused_plain_cp_render_train(p, rays, steps=16, t_near=2.0,
                                      t_far=6.0, block_rays=16,
                                      bwd_block_rays=16, interpret=True,
                                      enc_kind=enc_kind)
    return (jnp.mean((out[:, :3] - target) ** 2)
            + jnp.mean((out[:, 3] - 0.7) ** 2))

  def loss_oracle(p):
    out = model.apply(p, rays)
    acc = out["weights"].sum(-1)
    return (jnp.mean((out["rgb"] - target) ** 2)
            + jnp.mean((acc - 0.7) ** 2))

  lf, gf = jax.value_and_grad(loss_fused)(params)
  lo, go = jax.value_and_grad(loss_oracle)(params)
  np.testing.assert_allclose(float(lf), float(lo), rtol=2e-2)

  # Criteria (measured headroom: cp global rel ≈ 0.027, posenc ≈ 0.038,
  # min cosine ≈ 0.993):
  #  - global relative Frobenius error < 3% cp / 5% posenc — posenc's
  #    oscillatory features are inherently ~3x more bf16-sensitive (a
  #    pure-XLA bf16 oracle deviates 1.9% from f32 on this config vs
  #    0.6% for cp), so its bar scales with that measured floor;
  #  - per-tensor cosine > 0.98 (direction right everywhere — per-tensor
  #    MAGNITUDE error on tiny-norm tensors is bf16 cancellation noise).
  flat_f = jax.tree_util.tree_leaves_with_path(gf)
  flat_o = dict(jax.tree_util.tree_leaves_with_path(go))
  checked, num, den = 0, 0.0, 0.0
  for path, g_fused in flat_f:
    g_orc = flat_o[path]
    gf_n, go_n = np.asarray(g_fused, np.float64), np.asarray(g_orc,
                                                             np.float64)
    num += np.sum((gf_n - go_n) ** 2)
    den += np.sum(go_n ** 2)
    cos = (gf_n * go_n).sum() / max(
        np.linalg.norm(gf_n) * np.linalg.norm(go_n), 1e-20)
    assert cos > 0.98, (jax.tree_util.keystr(path), cos)
    if np.abs(go_n).max() > 0:
      checked += 1
  assert np.sqrt(num / den) < (0.03 if enc_kind == "cp" else 0.05), (
      np.sqrt(num / den))
  assert checked > 20  # every weight/bias actually received gradient


@pytest.mark.parametrize("table_size", [None, 1 << 11])
def test_fused_hash_render_and_grad_match_oracle(table_size):
  """NGP envelope (the reference's DEFAULT PlainNeRF encoder,
  src/neural_blocks.py:92-193). table_size=None is the 2^19 reference
  default (hash gather in XLA, downstream fused); a small table engages
  the fused one-hot MXU lookup kernel (ops/pallas/hash_encode.py)
  through the same dispatch. Checks forward parity, loss parity, and
  that gradients reach BOTH the MLP weights and the hash TABLE
  (through the [P, F] feature cotangent the backward kernel emits)."""
  from nerf_atlas_tpu.ops.pallas.render import (
      fused_plain_hash_render, fused_plain_hash_render_train)
  enc_kwargs = None if table_size is None else {"table_size": table_size}
  model = models.PlainNeRF(steps=16, t_near=2.0, t_far=6.0,
                           enc_kind="hash", enc_kwargs=enc_kwargs)
  n = 64
  key = jax.random.PRNGKey(0)
  r_o = jnp.tile(jnp.array([[0.0, 0, 3.5]]), (n, 1))
  r_d = jax.random.normal(key, (n, 3)) * 0.2 + jnp.array([0.0, 0, -1.0])
  rays = jnp.concatenate([r_o, r_d], -1)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  oracle = model.apply(params, rays)
  fused = fused_plain_hash_render(params, rays, steps=16, t_near=2.0,
                                  t_far=6.0, block_rays=32, interpret=True)
  np.testing.assert_allclose(np.asarray(fused[:, :3]),
                             np.asarray(oracle["rgb"]), atol=2e-2)

  target = jax.random.uniform(jax.random.PRNGKey(5), (n, 3))

  def loss_fused(p):
    out = fused_plain_hash_render_train(p, rays[:32], steps=16, t_near=2.0,
                                        t_far=6.0, block_rays=16,
                                        bwd_block_rays=16, interpret=True)
    return (jnp.mean((out[:, :3] - target[:32]) ** 2)
            + jnp.mean((out[:, 3] - 0.7) ** 2))

  def loss_oracle(p):
    out = model.apply(p, rays[:32])
    acc = out["weights"].sum(-1)
    return (jnp.mean((out["rgb"] - target[:32]) ** 2)
            + jnp.mean((acc - 0.7) ** 2))

  lf, gf = jax.value_and_grad(loss_fused)(params)
  lo, go = jax.value_and_grad(loss_oracle)(params)
  np.testing.assert_allclose(float(lf), float(lo), rtol=2e-2)

  flat_o = dict(jax.tree_util.tree_leaves_with_path(go))
  num, den = 0.0, 0.0
  table_grad_norm = 0.0
  for path, g_fused in jax.tree_util.tree_leaves_with_path(gf):
    g_orc = flat_o[path]
    a = np.asarray(g_fused, np.float64)
    b = np.asarray(g_orc, np.float64)
    num += np.sum((a - b) ** 2)
    den += np.sum(b ** 2)
    cos = (a * b).sum() / max(np.linalg.norm(a) * np.linalg.norm(b),
                              1e-20)
    assert cos > 0.98, (jax.tree_util.keystr(path), cos)
    if "table" in jax.tree_util.keystr(path):
      table_grad_norm = np.linalg.norm(a)
  # measured ≈ 0.041 — like posenc, the hash features (1e-4-scale table
  # entries) are more bf16-cancellation-sensitive than cp's; bar at the
  # posenc level
  assert np.sqrt(num / den) < 0.05, np.sqrt(num / den)
  assert table_grad_norm > 0  # the hash table actually trains


def test_fused_hash_render_unrolled_chunks_match_single_pass():
  """fused_plain_hash_render's chunking is an unrolled loop of direct
  kernel calls (round 5: a lax.map body scoped-vmem-OOMs on TPU for the
  packed hash operands — render.py chunking note). A chunked render,
  including a ragged tail that needs block padding, must equal the
  single-pass result exactly."""
  from nerf_atlas_tpu.ops.pallas.render import fused_plain_hash_render
  model = models.PlainNeRF(steps=16, t_near=2.0, t_far=6.0,
                           enc_kind="hash",
                           enc_kwargs={"table_size": 1 << 11})
  n = 160  # chunks of 64 -> two full chunks + a 32-ray tail
  key = jax.random.PRNGKey(3)
  r_o = jnp.tile(jnp.array([[0.0, 0, 3.5]]), (n, 1))
  r_d = jax.random.normal(key, (n, 3)) * 0.2 + jnp.array([0.0, 0, -1.0])
  rays = jnp.concatenate([r_o, r_d], -1)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  kw = dict(steps=16, t_near=2.0, t_far=6.0, interpret=True)
  want = fused_plain_hash_render(params, rays, block_rays=32, **kw)
  got = fused_plain_hash_render(params, rays, block_rays=32,
                                chunk_rays=64, **kw)
  np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                             rtol=1e-6, atol=1e-7)
  assert got.shape == (n, 4)


def test_fused_render_sharded_grad_matches_single():
  """shard_map multi-chip fused train path: outputs match the single-chip
  kernel and weight grads come back correctly psum'ed (8-device virtual
  CPU mesh, interpret mode)."""
  from nerf_atlas_tpu.ops.pallas.render import (
      fused_plain_cp_render_train_sharded)
  from nerf_atlas_tpu.parallel import make_mesh
  mesh = make_mesh(8)
  model = models.PlainNeRF(steps=8, t_near=2.0, t_far=6.0, enc_kind="cp")
  n = 128  # 8 devices x 16-ray blocks
  key = jax.random.PRNGKey(7)
  r_o = jnp.tile(jnp.array([[0.0, 0, 3.5]]), (n, 1))
  r_d = jax.random.normal(key, (n, 3)) * 0.2 + jnp.array([0.0, 0, -1.0])
  rays = jnp.concatenate([r_o, r_d], -1)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  target = jax.random.uniform(jax.random.PRNGKey(5), (n, 3))

  def loss(p, sharded):
    kw = dict(steps=8, t_near=2.0, t_far=6.0, block_rays=16,
              bwd_block_rays=16, interpret=True)
    if sharded:
      out = fused_plain_cp_render_train_sharded(p, rays, mesh=mesh, **kw)
    else:
      out = fused_plain_cp_render_train(p, rays, **kw)
    return (jnp.mean((out[:, :3] - target) ** 2)
            + jnp.mean((out[:, 3] - 0.7) ** 2))

  ls, gs = jax.value_and_grad(lambda p: loss(p, True))(params)
  l1, g1 = jax.value_and_grad(lambda p: loss(p, False))(params)
  np.testing.assert_allclose(float(ls), float(l1), rtol=1e-5)
  for path, a in jax.tree_util.tree_leaves_with_path(gs):
    b = dict(jax.tree_util.tree_leaves_with_path(g1))[path]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-3,
                               atol=1e-6,
                               err_msg=jax.tree_util.keystr(path))


def test_fused_render_white_sky_fat_sigmoid():
  """The widened kernel envelope: white sky + non-thin rgb activation
  match the oracle in both forward and gradient."""
  from nerf_atlas_tpu.ops.pallas.render import fused_plain_cp_render_train
  model = models.PlainNeRF(steps=8, t_near=2.0, t_far=6.0, enc_kind="cp",
                           sky_kind="white", sigmoid_kind="fat")
  n = 32
  key = jax.random.PRNGKey(11)
  r_o = jnp.tile(jnp.array([[0.0, 0, 3.5]]), (n, 1))
  r_d = jax.random.normal(key, (n, 3)) * 0.2 + jnp.array([0.0, 0, -1.0])
  rays = jnp.concatenate([r_o, r_d], -1)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  target = jax.random.uniform(jax.random.PRNGKey(5), (n, 3))

  fused = fused_plain_cp_render(params, rays, steps=8, block_rays=16,
                                interpret=True, sigmoid_kind="fat",
                                sky_kind="white")
  oracle = model.apply(params, rays)
  np.testing.assert_allclose(np.asarray(fused[:, :3]),
                             np.asarray(oracle["rgb"]), atol=2e-2)

  def loss_fused(p):
    out = fused_plain_cp_render_train(p, rays, steps=8, t_near=2.0,
                                      t_far=6.0, block_rays=16,
                                      bwd_block_rays=16, interpret=True,
                                      sigmoid_kind="fat",
                                      sky_kind="white")
    return jnp.mean((out[:, :3] - target) ** 2)

  def loss_oracle(p):
    return jnp.mean((model.apply(p, rays)["rgb"] - target) ** 2)

  lf, gf = jax.value_and_grad(loss_fused)(params)
  lo, go = jax.value_and_grad(loss_oracle)(params)
  np.testing.assert_allclose(float(lf), float(lo), rtol=2e-2)
  num, den = 0.0, 0.0
  flat_o = dict(jax.tree_util.tree_leaves_with_path(go))
  for path, g_f in jax.tree_util.tree_leaves_with_path(gf):
    a = np.asarray(g_f, np.float64)
    b = np.asarray(flat_o[path], np.float64)
    num += np.sum((a - b) ** 2)
    den += np.sum(b ** 2)
  assert np.sqrt(num / den) < 0.03, np.sqrt(num / den)


def _cam_rays(n, seed):
  r_o = jnp.tile(jnp.array([[0.0, 0, 3.5]]), (n, 1))
  r_d = (jax.random.normal(jax.random.PRNGKey(seed), (n, 3)) * 0.2
         + jnp.array([0.0, 0, -1.0]))
  return jnp.concatenate([r_o, r_d], -1)


def _grad_rel_err(gf, go):
  """(global relative Frobenius error, min per-tensor cosine)."""
  flat_o = dict(jax.tree_util.tree_leaves_with_path(go))
  num = den = 0.0
  worst = 1.0
  for path, g_f in jax.tree_util.tree_leaves_with_path(gf):
    a = np.asarray(g_f, np.float64)
    b = np.asarray(flat_o[path], np.float64)
    num += np.sum((a - b) ** 2)
    den += np.sum(b ** 2)
    worst = min(worst, (a * b).sum() / max(
        np.linalg.norm(a) * np.linalg.norm(b), 1e-20))
  return np.sqrt(num / den), worst


def test_fused_mip_render_and_grad_match_oracle():
  """MipNeRF IPE envelope (BASELINE config #2's feature path): in-kernel
  closed-form IPE vs the oracle's ops.mip path, forward and backward."""
  from nerf_atlas_tpu.ops.pallas.render import fused_plain_mip_render
  for kind in ("cone", "cylinder"):
    model = models.PlainNeRF(steps=16, t_near=2.0, t_far=6.0, mip=kind)
    rays = _cam_rays(64, 0)
    params = model.init({"params": jax.random.PRNGKey(0),
                         "sampler": jax.random.PRNGKey(1)}, rays,
                        train=True)
    oracle = model.apply(params, rays)
    fused = fused_plain_mip_render(params, rays, mip_kind=kind, steps=16,
                                   t_near=2.0, t_far=6.0, block_rays=32,
                                   interpret=True)
    np.testing.assert_allclose(np.asarray(fused[:, :3]),
                               np.asarray(oracle["rgb"]), atol=2e-2,
                               err_msg=kind)
    acc = oracle["weights"].sum(-1)
    np.testing.assert_allclose(np.asarray(fused[:, 3]), np.asarray(acc),
                               atol=2e-2, err_msg=kind)

  model = models.PlainNeRF(steps=16, t_near=2.0, t_far=6.0, mip="cone")
  rays = _cam_rays(64, 0)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  target = jax.random.uniform(jax.random.PRNGKey(5), (64, 3))

  def loss_fused(p):
    out = fused_plain_mip_render_train(p, rays, mip_kind="cone", steps=16,
                                       t_near=2.0, t_far=6.0,
                                       block_rays=16, bwd_block_rays=16,
                                       interpret=True)
    return (jnp.mean((out[:, :3] - target) ** 2)
            + jnp.mean((out[:, 3] - 0.7) ** 2))

  def loss_oracle(p):
    out = model.apply(p, rays)
    acc = out["weights"].sum(-1)
    return (jnp.mean((out["rgb"] - target) ** 2)
            + jnp.mean((acc - 0.7) ** 2))

  lf, gf = jax.value_and_grad(loss_fused)(params)
  lo, go = jax.value_and_grad(loss_oracle)(params)
  np.testing.assert_allclose(float(lf), float(lo), rtol=2e-2)
  rel, worst = _grad_rel_err(gf, go)
  # IPE features pass through bf16 before the MLP; measured headroom
  # rel ≈ 0.041, min cos ≈ 0.993
  assert rel < 0.08, rel
  assert worst > 0.98, worst


def test_fused_coarse_fine_matches_oracle():
  """Hierarchical envelope: coarse (want_weights) -> XLA sample_pdf ->
  per-ray-ts fine pass, vs CoarseFineNeRF's oracle, fwd + grads."""
  from nerf_atlas_tpu.ops.pallas.render import (fused_coarse_fine_render,
                                                fused_coarse_fine_train)
  model = models.CoarseFineNeRF(steps=8, fine_steps=8, t_near=2.0,
                                t_far=6.0, enc_kind="cp")
  rays = _cam_rays(64, 0)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  oracle = model.apply(params, rays)  # eval: deterministic CDF inversion
  fine, coarse = fused_coarse_fine_train(
      params, rays, enc_kind="cp", steps=8, fine_steps=8, t_near=2.0,
      t_far=6.0, block_rays=16, bwd_block_rays=16, interpret=True)
  np.testing.assert_allclose(np.asarray(fine[:, :3]),
                             np.asarray(oracle["rgb"]), atol=2e-2)
  np.testing.assert_allclose(np.asarray(coarse[:, :3]),
                             np.asarray(oracle["coarse_rgb"]), atol=2e-2)
  ev = fused_coarse_fine_render(params, rays, enc_kind="cp", steps=8,
                                fine_steps=8, t_near=2.0, t_far=6.0,
                                block_rays=16, interpret=True)
  np.testing.assert_allclose(np.asarray(ev), np.asarray(fine), atol=1e-5)

  target = jax.random.uniform(jax.random.PRNGKey(5), (64, 3))

  def loss_fused(p):
    f, c = fused_coarse_fine_train(
        p, rays, enc_kind="cp", steps=8, fine_steps=8, t_near=2.0,
        t_far=6.0, block_rays=16, bwd_block_rays=16, interpret=True)
    return (jnp.mean((f[:, :3] - target) ** 2)
            + jnp.mean((c[:, :3] - target) ** 2))

  def loss_oracle(p):
    out = model.apply(p, rays)
    return (jnp.mean((out["rgb"] - target) ** 2)
            + jnp.mean((out["coarse_rgb"] - target) ** 2))

  lf, gf = jax.value_and_grad(loss_fused)(params)
  lo, go = jax.value_and_grad(loss_oracle)(params)
  np.testing.assert_allclose(float(lf), float(lo), rtol=2e-2)
  rel, worst = _grad_rel_err(gf, go)
  assert rel < 0.08, rel
  assert worst > 0.97, worst


def test_rgb_act_matches_sigmoid_zoo():
  """Every fused rgb activation matches ops.math.SIGMOID_KINDS and its
  hand-derivative matches autograd (away from relu kinks)."""
  from nerf_atlas_tpu.ops.math import SIGMOID_KINDS
  from nerf_atlas_tpu.ops.pallas.render import (FUSED_SIGMOID_KINDS,
                                                _rgb_act_grad)
  v = jnp.linspace(-3.1, 2.9, 61)   # avoids exactly 0
  for kind in FUSED_SIGMOID_KINDS:
    act, dact = _rgb_act_grad(v, kind)
    ref = SIGMOID_KINDS[kind](v)
    np.testing.assert_allclose(np.asarray(act), np.asarray(ref),
                               atol=1e-6, err_msg=kind)
    num = jax.vmap(jax.grad(lambda x, k=kind: _rgb_act_grad(x, k)[0]))(v)
    np.testing.assert_allclose(np.asarray(dact), np.asarray(num),
                               atol=1e-5, err_msg=kind)


def test_fast_trig_error_bound():
  """The kernels' polynomial sin/cos stay within their documented error
  over many periods (range reduction correctness)."""
  from nerf_atlas_tpu.ops.pallas.render import _cos_approx, _sin_approx
  y = jnp.linspace(-40.0, 40.0, 40001)   # ±6 periods of sin(30x), x~1.3
  es = np.abs(np.asarray(_sin_approx(y)) - np.sin(np.asarray(y))).max()
  ec = np.abs(np.asarray(_cos_approx(y)) - np.cos(np.asarray(y))).max()
  assert es < 5e-5, es
  assert ec < 1e-5, ec


def test_fused_tiny_render_and_grad_match_oracle():
  """TinyNeRF envelope (enc_kind="tiny"): a single (sigma‖rgb) SkipConnMLP
  behind an 8-band posenc (reference src/nerf.py:278-305 — no view
  dependence, no refl stage). Forward, loss, and gradient parity vs the
  models.TinyNeRF XLA oracle."""
  model = models.TinyNeRF(steps=16, t_near=2.0, t_far=6.0)
  n = 64
  key = jax.random.PRNGKey(0)
  r_o = jnp.tile(jnp.array([[0.0, 0, 3.5]]), (n, 1))
  r_d = jax.random.normal(key, (n, 3)) * 0.2 + jnp.array([0.0, 0, -1.0])
  rays = jnp.concatenate([r_o, r_d], -1)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  oracle = model.apply(params, rays)
  fused = fused_plain_cp_render(params, rays, steps=16, t_near=2.0,
                                t_far=6.0, block_rays=32, interpret=True,
                                enc_kind="tiny")
  np.testing.assert_allclose(np.asarray(fused[:, :3]),
                             np.asarray(oracle["rgb"]), atol=2e-2)
  acc = oracle["weights"].sum(-1)
  np.testing.assert_allclose(np.asarray(fused[:, 3]), np.asarray(acc),
                             atol=2e-2)

  target = jax.random.uniform(jax.random.PRNGKey(5), (n, 3))

  def loss_fused(p):
    out = fused_plain_cp_render_train(p, rays[:32], steps=16, t_near=2.0,
                                      t_far=6.0, block_rays=16,
                                      bwd_block_rays=16, interpret=True,
                                      enc_kind="tiny")
    return (jnp.mean((out[:, :3] - target[:32]) ** 2)
            + jnp.mean((out[:, 3] - 0.7) ** 2))

  def loss_oracle(p):
    out = model.apply(p, rays[:32])
    acc = out["weights"].sum(-1)
    return (jnp.mean((out["rgb"] - target[:32]) ** 2)
            + jnp.mean((acc - 0.7) ** 2))

  lf, gf = jax.value_and_grad(loss_fused)(params)
  lo, go = jax.value_and_grad(loss_oracle)(params)
  np.testing.assert_allclose(float(lf), float(lo), rtol=2e-2)

  flat_f = jax.tree_util.tree_leaves_with_path(gf)
  flat_o = dict(jax.tree_util.tree_leaves_with_path(go))
  num, den, checked = 0.0, 0.0, 0
  for path, g_fused in flat_f:
    g_orc = flat_o[path]
    gf_n = np.asarray(g_fused, np.float64)
    go_n = np.asarray(g_orc, np.float64)
    num += np.sum((gf_n - go_n) ** 2)
    den += np.sum(go_n ** 2)
    cos = (gf_n * go_n).sum() / max(
        np.linalg.norm(gf_n) * np.linalg.norm(go_n), 1e-20)
    assert cos > 0.98, (jax.tree_util.keystr(path), cos)
    checked += 1
  # posenc-class bf16 sensitivity bound (see the cp/posenc test above)
  assert np.sqrt(num / den) < 0.05, np.sqrt(num / den)
  assert checked == 2 * (6 + 2)  # every layer's kernel+bias got grads


@pytest.mark.parametrize("enc_kind", ["cp", "posenc", "tiny", "cone"])
def test_fused_train_step_matches_vjp_path(enc_kind):
  """One-kernel train step (in-kernel L2 cotangent, render.py
  fused_plain_cp_train_step) vs jax.value_and_grad through the two-kernel
  custom-VJP path. Identical kernel math on both sides — only where the
  loss/cotangent is computed differs — so the match is tight."""
  from nerf_atlas_tpu.ops.pallas.render import fused_plain_cp_train_step

  if enc_kind == "tiny":
    model = models.TinyNeRF(steps=16, t_near=2.0, t_far=6.0)
  elif enc_kind == "cone":
    model = models.PlainNeRF(steps=16, t_near=2.0, t_far=6.0, mip="cone")
  else:
    model = models.PlainNeRF(steps=16, t_near=2.0, t_far=6.0,
                             enc_kind=enc_kind)
  n = 32
  key = jax.random.PRNGKey(3)
  r_o = jnp.tile(jnp.array([[0.0, 0, 3.5]]), (n, 1))
  r_d = jax.random.normal(key, (n, 3)) * 0.2 + jnp.array([0.0, 0, -1.0])
  rays = jnp.concatenate([r_o, r_d], -1)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  target = jax.random.uniform(jax.random.PRNGKey(5), (n, 3))

  def loss_vjp(p):
    out = fused_plain_cp_render_train(p, rays, steps=16, t_near=2.0,
                                      t_far=6.0, block_rays=16,
                                      bwd_block_rays=16, interpret=True,
                                      enc_kind=enc_kind)
    return jnp.mean((out[:, :3] - target) ** 2)

  lo, go = jax.value_and_grad(loss_vjp)(params)
  lf, gf = fused_plain_cp_train_step(params, rays, target, steps=16,
                                     t_near=2.0, t_far=6.0,
                                     bwd_block_rays=16, interpret=True,
                                     enc_kind=enc_kind)
  np.testing.assert_allclose(float(lf), float(lo), rtol=1e-5)
  flat_f = jax.tree_util.tree_leaves_with_path(gf)
  flat_o = dict(jax.tree_util.tree_leaves_with_path(go))
  assert len(flat_f) == len(flat_o) and flat_f
  for path, g_fused in flat_f:
    np.testing.assert_allclose(np.asarray(g_fused),
                               np.asarray(flat_o[path]),
                               rtol=1e-4, atol=5e-6,
                               err_msg=jax.tree_util.keystr(path))


def test_fused_hash_train_step_matches_vjp_path():
  """One-kernel train step for the hash envelope (table grad chains
  through the XLA hash VJP) vs value_and_grad over the two-kernel path."""
  from nerf_atlas_tpu.ops.pallas.render import (
      fused_plain_hash_render_train, fused_plain_hash_train_step)

  model = models.PlainNeRF(steps=16, t_near=2.0, t_far=6.0,
                           enc_kind="hash",
                           enc_kwargs={"table_size": 1 << 11})
  n = 32
  key = jax.random.PRNGKey(3)
  r_o = jnp.tile(jnp.array([[0.0, 0, 3.5]]), (n, 1))
  r_d = jax.random.normal(key, (n, 3)) * 0.2 + jnp.array([0.0, 0, -1.0])
  rays = jnp.concatenate([r_o, r_d], -1)
  params = model.init({"params": jax.random.PRNGKey(0),
                       "sampler": jax.random.PRNGKey(1)}, rays, train=True)
  target = jax.random.uniform(jax.random.PRNGKey(5), (n, 3))

  def loss_vjp(p):
    out = fused_plain_hash_render_train(p, rays, steps=16, t_near=2.0,
                                        t_far=6.0, block_rays=16,
                                        bwd_block_rays=16, interpret=True)
    return jnp.mean((out[:, :3] - target) ** 2)

  lo, go = jax.value_and_grad(loss_vjp)(params)
  lf, gf = fused_plain_hash_train_step(params, rays, target, steps=16,
                                       t_near=2.0, t_far=6.0,
                                       bwd_block_rays=16, interpret=True)
  np.testing.assert_allclose(float(lf), float(lo), rtol=1e-5)
  flat_f = jax.tree_util.tree_leaves_with_path(gf)
  flat_o = dict(jax.tree_util.tree_leaves_with_path(go))
  assert len(flat_f) == len(flat_o) and flat_f
  table_checked = False
  for path, g_fused in flat_f:
    np.testing.assert_allclose(np.asarray(g_fused),
                               np.asarray(flat_o[path]),
                               rtol=1e-4, atol=5e-6,
                               err_msg=jax.tree_util.keystr(path))
    if "table" in jax.tree_util.keystr(path):
      table_checked = bool(np.abs(np.asarray(g_fused)).max() > 0)
  assert table_checked  # the table received a real gradient
