"""Device mesh + sharding for data-parallel ray training.

The reference's only parallelism is single-process DataParallel
(/root/reference/runner.py:90, :1207-1209). TPU-native replacement:
a `jax.sharding.Mesh` with a `data` axis (optionally × `model` for
sharding large hash/voxel tables); ray batches shard along `data`,
parameters replicate, and XLA inserts the gradient all-reduce over ICI
when jit sees sharded inputs + replicated outputs. No NCCL analog, no
explicit collectives in user code — the sharding annotations are the
program.

Scaling notes (mesh design follows the standard JAX scaling recipe):
- rays are embarrassingly parallel -> pure DP is bandwidth-optimal for
  every model whose parameters fit on one chip (all of this zoo);
- the batch dimension must be divisible by the mesh size: the driver
  rounds ray batches up to a multiple of `mesh.size`;
- multi-host: the same code path works when jax.devices() spans hosts —
  per-host data loading feeds jax.make_array_from_process_local_data.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: Optional[int] = None,
              axis_names: Sequence[str] = ("data",)) -> Mesh:
  """1-D data mesh over the first n devices (default: all)."""
  devs = jax.devices()
  if n_devices is not None:
    devs = devs[:n_devices]
  shape = (len(devs),) + (1,) * (len(axis_names) - 1)
  return Mesh(np.asarray(devs).reshape(shape), axis_names)


def data_sharding(mesh: Mesh) -> NamedSharding:
  """Shard the leading (ray batch) axis over the data axis."""
  return NamedSharding(mesh, P("data"))


def replicate(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
  """Place [N, ...] arrays with the leading axis split over `data`."""
  s = data_sharding(mesh)
  return jax.tree.map(
      lambda x: jax.device_put(x, s) if hasattr(x, "ndim") and x.ndim >= 1
      else x, batch)


def round_up(n: int, k: int) -> int:
  return ((n + k - 1) // k) * k


def sharded_train_step(step_fn, mesh: Mesh, donate_state: bool = True):
  """jit `step_fn(params, opt_state, batch, key) -> (params, opt_state,
  metrics)` with params/opt replicated and batch sharded on `data`.

  XLA emits the psum over ICI for the gradient reduction automatically
  (sharded batch -> replicated grads).
  """
  repl = replicate(mesh)
  data = data_sharding(mesh)
  return jax.jit(
      step_fn,
      in_shardings=(repl, repl, (data, data, data), repl),
      out_shardings=(repl, repl, repl),
      donate_argnums=(0, 1) if donate_state else (),
  )
