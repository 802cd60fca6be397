"""Optimizers: optax kinds + UniformAdam.

Capability parity: /root/reference/runner.py:440-458 (adam/sgd/adamw/
rmsprop/uniform_adam) and src/opt.py:6-86 (UniformAdam: Adam whose update
is preconditioned by a pairwise-distance graph-Laplacian solve — a
diffusion/smoothing optimizer for point-set parameters like rig points
or sphere centers).

Schedule: cosine annealing to `sched_min` over `epochs` steps
(reference runner.py:1289), disabled with no_sched.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax


def _uniform_adam_precondition(updates, params, sigma: float = 0.5,
                               lam: float = 1.0):
  """For 2-D point-set params [N, 3], solve (I + λ L) u' = u with L the
  graph Laplacian of a Gaussian-affinity pairwise-distance graph: nearby
  points receive correlated (smoothed) updates."""
  def precond(u, p):
    if u.ndim != 2 or p.shape[-1] != 3 or p.shape[0] > 4096:
      return u
    d2 = jnp.sum((p[:, None] - p[None, :]) ** 2, -1)
    W = jnp.exp(-d2 / (2 * sigma ** 2))
    L = jnp.diag(jnp.sum(W, -1)) - W
    A = jnp.eye(p.shape[0], dtype=p.dtype) + lam * L
    return jax.scipy.linalg.solve(A, u, assume_a="pos")

  return jax.tree.map(precond, updates, params)


def uniform_adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                 sigma: float = 0.5, lam: float = 1.0):
  """Adam + Laplacian-smoothing preconditioner on point-set params."""
  adam = optax.scale_by_adam(b1=b1, b2=b2, eps=eps)

  def init_fn(params):
    return adam.init(params)

  def update_fn(updates, state, params=None):
    updates, state = adam.update(updates, state, params)
    if params is not None:
      updates = _uniform_adam_precondition(updates, params, sigma, lam)
    return updates, state

  return optax.chain(
      optax.GradientTransformation(init_fn, update_fn),
      optax.scale_by_learning_rate(learning_rate),
  )


OPT_KINDS = {
    "adam": optax.adam,
    "adamw": optax.adamw,
    "sgd": optax.sgd,
    "rmsprop": optax.rmsprop,
    "uniform_adam": uniform_adam,
}


def load_optimizer(kind: str = "adam", learning_rate: float = 5e-4,
                   total_steps: Optional[int] = None,
                   sched_min: float = 5e-5, no_sched: bool = False,
                   grad_clip: float = 0.0, accum_steps: int = 1,
                   weight_decay: float = 0.0):
  """Build the optax chain: [clip] -> opt(cosine lr) -> [accumulate]."""
  ctor = OPT_KINDS.get(kind)
  if ctor is None:
    raise NotImplementedError(f"unknown optimizer kind {kind}")

  if no_sched or total_steps is None:
    lr = learning_rate
  else:
    lr = optax.cosine_decay_schedule(
        learning_rate, total_steps, alpha=sched_min / learning_rate)

  kwargs = {}
  if kind == "adamw" and weight_decay:
    kwargs["weight_decay"] = weight_decay
  opt = ctor(lr, **kwargs)

  parts = []
  if grad_clip > 0:
    parts.append(optax.clip_by_global_norm(grad_clip))
  if weight_decay and kind != "adamw":
    # the reference feeds --decay to torch Adam's weight_decay
    # (runner.py:88,456); optax's equivalent is a decay term in the chain
    parts.append(optax.add_decayed_weights(weight_decay))
  parts.append(opt)
  tx = optax.chain(*parts)
  if accum_steps > 1:
    tx = optax.MultiSteps(tx, every_k_schedule=accum_steps)
  return tx
