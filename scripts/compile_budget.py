#!/usr/bin/env python3
"""Cold-compile budget guard for the fused kernel families.

Round 3 lost its bench artifact (BENCH_r03.json rc=124) because a kernel
change pushed cold compiles past the capture budget, and twice during
development a Mosaic schedule blew up to hour-class compiles (the
64-way-unrolled hash corners, the 32K-sample fine block — BENCH_NOTES.md).
Nothing failed until the round's evidence was already gone. This script
makes compile time a TESTED budget: each fused family's train step is
jit-compiled against a FRESH persistent-cache dir (so every compile is
cold) and must finish under --budget-sec.

Usage:
  python scripts/compile_budget.py                 # all families
  python scripts/compile_budget.py --families hash,coarse_fine
  python scripts/compile_budget.py --out COMPILE_BUDGET_r04.json

Exit code 1 if any family exceeds the budget. Emits one JSON line per
family as it completes (timeout-proof, the BENCH_r03 lesson), then a
summary JSON to --out.

tests/test_compile_budget.py wraps this in a subprocess (escaping the
suite's CPU-platform conftest) as the slow-tier regression guard.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

# Per-family ceilings (seconds). The shared default is deliberately well
# above the measured cold compiles (~1-5 min each, BENCH_NOTES.md) and
# well below the hour-class blowups the guard exists to catch.
FAMILIES = ("tiny", "posenc", "hash", "mip", "ae", "volsdf", "dnerf",
            "dnerf_spline", "coarse_fine")


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--families", default=",".join(FAMILIES))
  ap.add_argument("--budget-sec", type=float, default=480.0)
  ap.add_argument("--out", default=os.path.join(REPO,
                                                "COMPILE_BUDGET.json"))
  args = ap.parse_args()
  fams = [f.strip() for f in args.families.split(",") if f.strip()]
  unknown = [f for f in fams if f not in FAMILIES]
  if unknown:
    raise SystemExit(f"unknown families {unknown}; known: {FAMILIES}")

  import jax
  # fresh cache dir -> every XLA/Mosaic compile below is cold
  cache = tempfile.mkdtemp(prefix="jax_cache_cold_")
  jax.config.update("jax_compilation_cache_dir", cache)

  import bench  # noqa: E402  (repo root; reuses the bench step builders)

  backend = jax.default_backend()
  rows, ok = {}, True
  for fam in fams:
    t0 = time.perf_counter()
    err = None
    try:
      # n=1: one compile + one step; cold compile dominates wall time
      bench.bench_config_train(fam, fused=True, n=1)
    except Exception as e:  # noqa: BLE001
      err = f"{type(e).__name__}: {e}"
    dt = time.perf_counter() - t0
    row = {"family": fam, "compile_plus_1step_sec": round(dt, 1),
           "budget_sec": args.budget_sec,
           "within_budget": err is None and dt <= args.budget_sec}
    if err:
      row["error"] = err[:500]
    ok = ok and row["within_budget"]
    rows[fam] = row
    print(json.dumps(row), flush=True)

  summary = {"backend": backend, "cache_dir": "fresh (cold compiles)",
             "budget_sec": args.budget_sec, "ok": ok, "families": rows}
  with open(args.out, "w") as f:
    json.dump(summary, f, indent=1)
  print(json.dumps({"ok": ok, "out": args.out}))
  sys.exit(0 if ok else 1)


if __name__ == "__main__":
  main()
