"""Shape/gradient sanity for neural blocks."""
import jax
import jax.numpy as jnp
import numpy as np

from nerf_atlas_tpu import nn as nnb


def test_positional_encoder_size():
  enc = nnb.PositionalEncoder(input_dims=3, num_freqs=4)
  x = jnp.ones((5, 3))
  params = enc.init(jax.random.PRNGKey(0), x)
  out = enc.apply(params, x)
  assert out.shape == (5, enc.size())


def test_fourier_encoder():
  enc = nnb.FourierEncoder(input_dims=3, freqs=8)
  x = jnp.ones((4, 3))
  params = enc.init(jax.random.PRNGKey(0), x)
  out = enc.apply(params, x)
  assert out.shape == (4, 16)
  # scaled freqs change the output
  out2 = enc.apply(params, x, freq_scale=2.0)
  assert not np.allclose(out, out2)


def test_hash_encoder_shapes_and_grads():
  enc = nnb.HashEncoder(levels=4, table_size=1 << 10, features=2,
                        base_res=4, max_res=32)
  x = jax.random.uniform(jax.random.PRNGKey(1), (7, 3), minval=-1, maxval=1)
  params = enc.init(jax.random.PRNGKey(0), x)
  out = enc.apply(params, x)
  assert out.shape == (7, 8)
  # interpolation is continuous: nearby points give nearby features
  out_eps = enc.apply(params, x + 1e-5)
  np.testing.assert_allclose(out, out_eps, atol=1e-3)
  # gradients flow into the table
  g = jax.grad(lambda p: enc.apply(p, x).sum())(params)
  assert float(jnp.abs(g["params"]["table"]).sum()) > 0


def test_hash_encoder_dense_level_injective():
  # at base_res=4, 4^3=64 <= table 1024 -> dense indexing, distinct cells
  enc = nnb.HashEncoder(levels=1, table_size=1 << 10, features=2,
                        base_res=4, max_res=4)
  params = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 3)))
  a = enc.apply(params, jnp.array([[-1.0, -1.0, -1.0]]))
  b = enc.apply(params, jnp.array([[1.0, 1.0, 1.0]]))
  assert not np.allclose(a, b)


def test_skipconn_mlp_shapes_and_latent():
  mlp = nnb.SkipConnMLP(in_size=3, out=4, latent_size=2, num_layers=3,
                        hidden_size=32)
  x = jnp.ones((6, 3))
  lat = jnp.ones((6, 2))
  params = mlp.init(jax.random.PRNGKey(0), x, lat)
  out = mlp.apply(params, x, lat)
  assert out.shape == (6, 4)


def test_skipconn_mlp_init_kinds():
  x = jnp.ones((2, 3))
  for kind in ("xavier", "kaiming", "siren", "zero"):
    mlp = nnb.SkipConnMLP(in_size=3, out=1, num_layers=2, hidden_size=16,
                          init_kind=kind)
    params = mlp.init(jax.random.PRNGKey(0), x)
    out = mlp.apply(params, x)
    assert jnp.isfinite(out).all(), kind


def test_skipconn_mlp_zero_last():
  mlp = nnb.SkipConnMLP(in_size=3, out=3, num_layers=2, hidden_size=16,
                        zero_last=True)
  x = jax.random.normal(jax.random.PRNGKey(0), (5, 3))
  params = mlp.init(jax.random.PRNGKey(1), x)
  out = mlp.apply(params, x)
  np.testing.assert_allclose(out, 0.0)  # zero last layer + zero bias


def test_skipconn_mlp_with_encoder():
  mlp = nnb.SkipConnMLP(in_size=3, out=2, num_layers=2, hidden_size=16,
                        enc=nnb.PositionalEncoder(input_dims=3, num_freqs=3))
  x = jnp.ones((4, 3))
  params = mlp.init(jax.random.PRNGKey(0), x)
  assert mlp.apply(params, x).shape == (4, 2)


def test_spatial_encoder_sample():
  enc = nnb.SpatialEncoder(latent_size=8, num_blocks=2)
  img = jnp.ones((32, 32, 3))
  params = enc.init(jax.random.PRNGKey(0), img)
  feats = enc.apply(params, img)
  uv = jnp.zeros((5, 2))
  out = nnb.SpatialEncoder.sample(feats, uv)
  assert out.shape == (5, 8)


def test_upsampler():
  up = nnb.Upsampler(in_size=8, out_size=32)
  img = jnp.ones((1, 8, 8, 3))
  params = up.init(jax.random.PRNGKey(0), img)
  out = up.apply(params, img)
  assert out.shape == (1, 32, 32, 3)


def test_encoded_gru():
  gru = nnb.EncodedGRU(out=1, hidden_size=16, sigmas=(2.0, 4.0))
  x = jnp.ones((3, 5, 3))
  params = gru.init(jax.random.PRNGKey(0), x)
  out = gru.apply(params, x)
  assert out.shape == (2, 3, 5, 1)


def test_pointnet_permutation_invariant():
  pn = nnb.PointNet(feats=16)
  pts = jax.random.normal(jax.random.PRNGKey(0), (10, 3))
  params = pn.init(jax.random.PRNGKey(1), pts)
  a = pn.apply(params, pts)
  b = pn.apply(params, pts[::-1])
  np.testing.assert_allclose(a, b, rtol=1e-5)


def test_style_loss_zero_for_same_image():
  sl = nnb.StyleLoss(features=(4, 8))
  img = jax.random.uniform(jax.random.PRNGKey(0), (1, 16, 16, 3))
  params = sl.init(jax.random.PRNGKey(1), img, img)
  loss = sl.apply(params, img, img)
  assert float(loss) < 1e-10


def test_update_operator_smoke():
  """RAFT-style conv-GRU (reference src/neural_blocks.py:440-482 —
  imported there but unused; kept as a library block here, so it gets a
  shape/finite smoke check)."""
  op = nnb.UpdateOperator(hidden_size=8, out_features=2, iters=2)
  x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
  params = op.init(jax.random.PRNGKey(1), x)
  out = op.apply(params, x)
  assert out.shape == (1, 8, 8, 2)
  assert np.isfinite(np.asarray(out)).all()


def test_discriminator_smoke():
  """DCGAN-style discriminator (reference src/neural_blocks.py:522-563,
  unfinished there; working block here)."""
  d = nnb.Discriminator(features=(8, 16))
  img = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 3))
  params = d.init(jax.random.PRNGKey(1), img)
  out = d.apply(params, img)
  assert out.shape == (2, 1)
  assert np.isfinite(np.asarray(out)).all()
