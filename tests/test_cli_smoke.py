"""End-to-end CLI smoke: train 2 epochs on synthetic data, then evaluate
the saved checkpoint — the full user path through tools/."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_train_then_test_cli(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    work_dir = str(tmp_path / "run")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         os.path.join(REPO, "configs", "exp", "debug_retrieval_synthetic.py"),
         "--work-dir", work_dir, "--cpu"],
        env=env, capture_output=True, text=True, timeout=500)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(work_dir, "metrics.jsonl"))
    ckpt_dir = os.path.join(work_dir, "checkpoints")
    assert os.path.isdir(ckpt_dir)

    r2 = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "test.py"),
         os.path.join(REPO, "configs", "exp", "debug_retrieval_synthetic.py"),
         "--ckpt-dir", ckpt_dir, "--cpu"],
        env=env, capture_output=True, text=True, timeout=300)
    assert r2.returncode == 0, r2.stderr[-2000:]
    metrics = json.loads(r2.stdout.strip().splitlines()[-1])
    assert "Recall@1" in metrics and "Recall@all" in metrics
