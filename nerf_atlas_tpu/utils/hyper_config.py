"""JSON hyper-parameter files (`--param-file`).

Capability parity: /root/reference/src/hyper_config.py:25-62 — a JSON
dict with dotted-path `get(key, kind, default)` lookups layered on top of
CLI flags. Values in the file override argparse defaults but not
explicitly-passed flags.
"""
from __future__ import annotations

import json
from typing import Any, Optional


class HyperParameters:
  def __init__(self, data: Optional[dict] = None):
    self.data = data or {}

  def get(self, key: str, kind=None, default: Any = None):
    """Dotted-path lookup: get("model.steps", int, 64)."""
    node = self.data
    for part in key.split("."):
      if not isinstance(node, dict) or part not in node:
        return default
      node = node[part]
    return kind(node) if kind is not None else node

  def apply_to_args(self, args, parser=None, argv=None):
    """Override argparse defaults with file values; explicitly-passed CLI
    flags win. Flat keys use underscores or dashes.

    Precedence needs the parser: a dest counts as explicit when any of
    its option strings appears in argv (handles --flag v and --flag=v).
    Without a parser every file value applies (legacy behavior).
    """
    import sys
    argv = argv if argv is not None else sys.argv[1:]
    explicit = set()
    if parser is not None:
      for action in parser._actions:
        if any(a == opt or a.startswith(opt + "=")
               for opt in action.option_strings for a in argv):
          explicit.add(action.dest)
    for key, val in self.data.items():
      attr = key.replace("-", "_")
      if hasattr(args, attr) and attr not in explicit:
        setattr(args, attr, val)
    return args


def load_param_file(path: Optional[str]) -> HyperParameters:
  if not path:
    return HyperParameters()
  with open(path) as f:
    return HyperParameters(json.load(f))
