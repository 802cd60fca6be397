"""Compile-time regression guard (VERDICT r3 weak #7): the thing that
killed BENCH_r03 (a kernel change silently pushing cold Mosaic compiles
to hour-class) should fail a test, not a round artifact.

Runs scripts/compile_budget.py in a SUBPROCESS with the suite's CPU
platform forcing stripped, so it compiles on the real TPU through the
tunnel. Skips when no TPU backend is reachable (CI hosts). Slow tier
only — it serializes with anything else using the chip.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _tpu_env():
  env = dict(os.environ)
  env.pop("JAX_PLATFORMS", None)
  flags = env.get("XLA_FLAGS", "")
  env["XLA_FLAGS"] = " ".join(
      f for f in flags.split()
      if "xla_force_host_platform_device_count" not in f)
  return env


def _have_tpu(env):
  probe = subprocess.run(
      [sys.executable, "-c",
       "import jax; print(jax.default_backend())"],
      capture_output=True, text=True, timeout=120, env=env)
  return probe.returncode == 0 and "cpu" not in probe.stdout


@pytest.mark.slow
def test_fused_kernels_compile_under_budget(tmp_path):
  env = _tpu_env()
  if not _have_tpu(env):
    pytest.skip("no TPU backend reachable")
  out = tmp_path / "compile_budget.json"
  # the two families with a history of Mosaic schedule blowups
  # (BENCH_NOTES.md: the 32K-sample fine block, the 64-way unrolled
  # hash corners); the full sweep runs via the script directly
  r = subprocess.run(
      [sys.executable, os.path.join(REPO, "scripts", "compile_budget.py"),
       "--families", "hash,coarse_fine", "--budget-sec", "480",
       "--out", str(out)],
      capture_output=True, text=True, timeout=1800, env=env, cwd=REPO)
  assert r.returncode == 0, (r.stdout[-2000:], r.stderr[-2000:])
  summary = json.loads(out.read_text())
  assert summary["ok"], summary
