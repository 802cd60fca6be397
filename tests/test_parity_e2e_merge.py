"""PARITY_E2E.json merge semantics (advisor r04: high + medium).

Two parity_e2e invocations may interleave (torch-CPU reference side and
TPU ours side). The save() merge must guarantee:
  1. writes made AFTER an earlier save() in the same run still land
     (the r04 high bug: save() replaced the row dict, orphaning the
     caller's alias so later keys were silently dropped);
  2. a key another invocation wrote to disk survives unless THIS
     invocation actually recomputed it (the r04 medium bug: every key
     present at startup counted as "in-memory" and clobbered disk).

We exercise main() directly with run_ours/run_reference monkeypatched,
simulating the interleaved writer by mutating the JSON from inside the
fake reference runner.
"""
import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_pe(tmp_path, monkeypatch):
  spec = importlib.util.spec_from_file_location(
      "parity_e2e_under_test",
      os.path.join(REPO, "scripts", "parity_e2e.py"))
  mod = importlib.util.module_from_spec(spec)
  spec.loader.exec_module(mod)
  # PARITY_E2E.json is written next to the module's REPO constant;
  # point it at the tmp dir so the test never touches the real artifact
  monkeypatch.setattr(mod, "REPO", str(tmp_path))
  monkeypatch.setattr(mod, "export_scene",
                      lambda *a, **k: None)
  return mod


def _run(mod, argv, tmp_path):
  old = sys.argv
  sys.argv = ["parity_e2e.py"] + argv + ["--workdir", str(tmp_path)]
  # the scene-existence check looks for transforms_train.json
  for sub in ("scene", "scene_dyn"):
    d = tmp_path / sub
    d.mkdir(exist_ok=True)
    (d / "transforms_train.json").write_text("{}")
  try:
    mod.main()
  finally:
    sys.argv = old


def test_later_writes_survive_earlier_save(tmp_path, monkeypatch):
  """ours + diagnose-hash + reference must ALL persist (r04 high)."""
  pe = _load_pe(tmp_path, monkeypatch)
  monkeypatch.setattr(pe, "run_ours",
                      lambda *a, **k: 30.0 if k.get("enc_override")
                      else 35.0)
  monkeypatch.setattr(pe, "run_reference", lambda *a, **k: 24.0)
  _run(pe, ["--variants", "plain", "--diagnose-hash", "--epochs", "3"],
       tmp_path)
  out = json.load(open(tmp_path / "PARITY_E2E.json"))
  row = out["variants"]["plain"]
  assert row["ours_test_psnr"] == 35.0
  assert row["ours_refhash_test_psnr"] == 30.0
  assert row["reference_test_psnr"] == 24.0
  assert row["delta_db"] == pytest.approx(11.0)


def test_interleaved_writer_not_clobbered(tmp_path, monkeypatch):
  """A fresher disk value for a key THIS run didn't compute must win
  (r04 medium), while keys this run DID compute must still land."""
  pe = _load_pe(tmp_path, monkeypatch)
  path = tmp_path / "PARITY_E2E.json"
  # stale state present at startup (so the key exists when main loads)
  path.write_text(json.dumps(
      {"variants": {"plain": {"reference_test_psnr": 1.0}}}))

  def fake_ours(*a, **k):
    # interleaved invocation lands a FRESHER reference value mid-run
    cur = json.load(open(path))
    cur["variants"]["plain"]["reference_test_psnr"] = 24.5
    path.write_text(json.dumps(cur))
    return 35.0

  monkeypatch.setattr(pe, "run_ours", fake_ours)
  _run(pe, ["--variants", "plain", "--skip-reference", "--epochs", "3"],
       tmp_path)
  row = json.load(open(path))["variants"]["plain"]
  assert row["ours_test_psnr"] == 35.0           # ours landed
  assert row["reference_test_psnr"] == 24.5      # fresher disk value won
  assert row["delta_db"] == pytest.approx(10.5)  # delta used merged row
