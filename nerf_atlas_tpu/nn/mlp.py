"""SkipConnMLP — the universal field MLP of the framework.

Capability parity: /root/reference/src/neural_blocks.py:204-311 — an MLP
whose encoded input (plus optional latent) is re-concatenated every `skip`
layers, with pluggable encoder and init schemes {xavier, kaiming, siren,
zero} and optional zero/uniform-ized last layer.

TPU-first design: a single `nn.Dense` per layer over an arbitrary batch
shape — callers flatten [..., T] sample grids into one [N, D] batch so
each layer is one big MXU matmul. `dtype` selects the activation compute
dtype (bfloat16 recommended on TPU); params stay float32.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def _siren_w0_init(key, shape, dtype=jnp.float32):
  fan_in = shape[0]
  bound = 1.0 / fan_in
  return jax.random.uniform(key, shape, dtype, -bound, bound)


def _siren_hidden_init(key, shape, dtype=jnp.float32, w0: float = 30.0):
  fan_in = shape[0]
  bound = math.sqrt(6.0 / fan_in) / w0
  return jax.random.uniform(key, shape, dtype, -bound, bound)


def _last_uniform_init(key, shape, dtype=jnp.float32, eps: float = 1e-3):
  return jax.random.uniform(key, shape, dtype, -eps, eps)


INIT_KINDS = ("xavier", "kaiming", "siren", "zero")


class SkipConnMLP(nn.Module):
  """MLP with periodic skip-concatenation of the encoded input.

  Wiring matches the reference (src/neural_blocks.py:279-311) exactly —
  verified by weight-transplant parity in tests/test_parity_reference.py:
    init = concat(x, enc(x), latent)      # raw input ALWAYS included
    h    = layer_in(init)
    for i in range(num_layers):
      if i % skip == 0 and i != num_layers - 1:
        h = concat(h, init)               # skip fires at i=0 too
      h = layer_i(act(h))                 # pre-activation order
    out  = layer_out(act(h))

  in_size:    raw input feature width (pre-encoding)
  out:        output feature width
  latent_size: width of the optional latent concatenated to the input
  enc:        optional encoder module applied to the raw input
  num_layers / hidden_size / skip: architecture
  activation: hidden nonlinearity (ignored for siren init, which uses
              sin(siren_w0 * x); the reference leaves its siren users at
              plain torch.sin — set siren_w0=1.0 for that behavior)
  init:       one of INIT_KINDS
  zero_last / uniform_last: last-layer treatment (stabilizes residual
              fields like Δx deformations)
  dtype:      compute dtype for activations (params stay float32)
  """
  in_size: int = 3
  out: int = 3
  latent_size: int = 0
  enc: Optional[nn.Module] = None
  num_layers: int = 5
  hidden_size: int = 256
  skip: int = 3
  activation: Callable = nn.leaky_relu
  init_kind: str = "xavier"
  siren_w0: float = 30.0
  zero_last: bool = False
  uniform_last: bool = False
  dtype: Any = jnp.float32

  @nn.compact
  def __call__(self, x, latent: Optional[jax.Array] = None):
    assert self.init_kind in INIT_KINDS, self.init_kind
    siren = self.init_kind == "siren"
    if self.init_kind == "xavier":
      k_init = nn.initializers.xavier_uniform()
    elif self.init_kind == "kaiming":
      k_init = nn.initializers.kaiming_normal()
    elif self.init_kind == "zero":
      k_init = nn.initializers.zeros
    else:
      k_init = _siren_hidden_init

    parts = [x]
    if self.enc is not None:
      parts.append(self.enc(x))
    if latent is not None and self.latent_size > 0:
      lat = jnp.broadcast_to(latent, x.shape[:-1] + latent.shape[-1:])
      parts.append(lat)
    else:
      assert self.latent_size == 0, (
          f"expected latent of size {self.latent_size}, got None")
    init_feat = jnp.concatenate(parts, axis=-1).astype(self.dtype)

    w0 = self.siren_w0
    act = (lambda v: jnp.sin(w0 * v)) if siren else self.activation

    h = nn.Dense(self.hidden_size, dtype=self.dtype,
                 kernel_init=_siren_w0_init if siren else k_init,
                 name="layer_in")(init_feat)
    for i in range(self.num_layers):
      if (i % self.skip) == 0 and i != self.num_layers - 1:
        h = jnp.concatenate([h, init_feat], axis=-1)
      h = nn.Dense(self.hidden_size, dtype=self.dtype, kernel_init=k_init,
                   name=f"layer_{i}")(act(h))

    if self.zero_last:
      last_init = nn.initializers.zeros
    elif self.uniform_last:
      last_init = _last_uniform_init
    elif siren:
      last_init = _siren_hidden_init
    else:
      last_init = k_init
    out = nn.Dense(self.out, dtype=self.dtype, kernel_init=last_init,
                   name="layer_out")(act(h))
    return out.astype(jnp.float32)
