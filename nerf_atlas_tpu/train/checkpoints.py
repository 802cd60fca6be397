"""Structured (pytree) checkpoints with module-swap surgery.

Capability parity: the reference pickles whole nn.Modules
(runner.py:1215-1227) and performs checkpoint *surgery* by replacing
submodules on load (`--replace refl/occ/bg/...`, set_per_run,
runner.py:1041-1170). Opaque pickles can't do that safely; here a
checkpoint is (params pytree as msgpack) + (JSON config of the model
registry kind/kwargs), and surgery is a pytree merge: build the new
model's init params, then graft every matching subtree from the old
checkpoint — swapped modules simply fall back to their fresh init.

Versioned saves and optimizer-state saving are supported
(`--versioned-save`, `--save-load-opt` analogs).
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def save(path: str, params, config: Optional[Dict[str, Any]] = None,
         opt_state=None, step: int = 0, versioned: bool = False,
         async_save: bool = False):
  """Write params (+ optional optimizer state) and a JSON config sidecar.

  async_save: serialize on the calling thread (arrays fetched to host)
  but write to disk on a daemon thread so the train loop never blocks on
  IO (the orbax-style async pattern SURVEY §5 calls for). Writes go to a
  temp file + atomic rename, so a crash mid-save never corrupts the
  previous checkpoint."""
  if versioned:
    base, ext = os.path.splitext(path)
    path = f"{base}_{step:07d}{ext}"
  os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
  payload = {"params": params, "step": step}
  if opt_state is not None:
    payload["opt_state"] = opt_state
  data = serialization.to_bytes(payload)

  def _write():
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
      f.write(data)
    os.replace(tmp, path)
    if config is not None:
      with open(path + ".json", "w") as f:
        json.dump(config, f, indent=2, default=str)

  if async_save:
    import threading
    t = threading.Thread(target=_write, daemon=True)
    t.start()
    _PENDING_SAVES.append(t)
  else:
    _write()
  return path


_PENDING_SAVES: list = []


def wait_for_saves():
  """Block until all async checkpoint writes have landed."""
  while _PENDING_SAVES:
    _PENDING_SAVES.pop().join()


def load(path: str, like: Optional[Dict[str, Any]] = None):
  """Read a checkpoint. `like` is a template pytree (e.g. fresh init) used
  to restore exact array types/structure; without it, returns raw
  dict-of-arrays."""
  with open(path, "rb") as f:
    data = f.read()
  if like is not None:
    return serialization.from_bytes(like, data)
  return serialization.msgpack_restore(data)


def load_config(path: str) -> Optional[Dict[str, Any]]:
  cfg_path = path + ".json"
  if os.path.exists(cfg_path):
    with open(cfg_path) as f:
      return json.load(f)
  return None


def save_camera(path: str, camera):
  """Serialize a camera pytree (--cam-save-load analog,
  reference runner.py:1227,1253-1255)."""
  os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
  with open(path, "wb") as f:
    f.write(serialization.to_bytes(camera))


def load_camera(path: str, like):
  """Restore a camera pytree onto a template (the dataset's camera)."""
  with open(path, "rb") as f:
    return serialization.from_bytes(like, f.read())


def graft(fresh: Any, saved: Any) -> Tuple[Any, list, list]:
  """Merge a saved params tree into a freshly-initialized one.

  Every leaf whose path exists in both trees with a matching shape is
  taken from `saved`; everything else keeps the fresh init. Returns
  (merged, restored_paths, skipped_paths) — the module-replacement
  mechanism: swap the model config, graft the old checkpoint, and only
  the replaced submodule re-initializes.
  """
  restored, skipped = [], []

  def merge(f, s, path):
    if isinstance(f, dict):
      if not isinstance(s, dict):
        skipped.append(path)
        return f
      return {k: merge(v, s[k], f"{path}/{k}") if k in s
              else (skipped.append(f"{path}/{k}") or v)
              for k, v in f.items()}
    if s is None:
      skipped.append(path)
      return f
    s_arr = jnp.asarray(s)
    if hasattr(f, "shape") and f.shape == s_arr.shape:
      restored.append(path)
      return s_arr.astype(f.dtype)
    skipped.append(path)
    return f

  return merge(fresh, saved, ""), restored, skipped


def restore_or_graft(path: str, fresh_params, replace=(), remaps=()):
  """Load `path` and graft onto `fresh_params`; tolerant of structure
  drift (the surgery path). `replace` names submodule keys to re-init
  even when the checkpoint matches (the `--replace refl/occ/sky/...`
  analog: any subtree whose key contains one of the names keeps its
  fresh init). `remaps` is a sequence of (src_path, dst_path) key-tuples:
  each moves a saved subtree to a new location before grafting — the
  module-conversion mechanism (e.g. --all-learned-to-joint nests the old
  AllLearnedOcc under occ/all_learned; reference runner.py:1095-1101).
  Returns (params, info dict)."""
  raw = load(path)
  saved = raw.get("params", raw)
  for src, dst in remaps:
    saved = remap_subtree(saved, tuple(src), tuple(dst))
  if replace:
    saved = _drop_subtrees(saved, tuple(replace))
  merged, restored, skipped = graft(fresh_params, saved)
  return merged, {"restored": restored, "skipped": skipped,
                  "step": int(raw.get("step", 0)),
                  "opt_state": raw.get("opt_state")}


def remap_subtree(tree, src: Tuple[str, ...], dst: Tuple[str, ...]):
  """Move the subtree at key-path `src` to key-path `dst` (pure)."""
  def get(t, path):
    for k in path:
      if not isinstance(t, dict) or k not in t:
        return None
      t = t[k]
    return t

  sub = get(tree, src)
  if sub is None:
    return tree

  def drop(t, path):
    if not path:
      return None
    if not isinstance(t, dict):
      return t
    out = {}
    for k, v in t.items():
      if k == path[0]:
        v = drop(v, path[1:])
        if v is None:
          continue
      out[k] = v
    return out

  def insert(t, path, sub_t):
    if not path:
      return sub_t
    t = dict(t) if isinstance(t, dict) else {}
    t[path[0]] = insert(t.get(path[0], {}), path[1:], sub_t)
    return t

  return insert(drop(tree, src), dst, sub)


def _drop_subtrees(tree, names: Tuple[str, ...]):
  """Remove dict subtrees whose key matches any of `names`."""
  if not isinstance(tree, dict):
    return tree
  return {k: _drop_subtrees(v, names)
          for k, v in tree.items()
          if not any(n in k for n in names)}
