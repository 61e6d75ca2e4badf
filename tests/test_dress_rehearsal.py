"""Real-weight conversion dress rehearsal as a slow-tier test.

Runs tools/dress_rehearsal.py end-to-end: synthetic TRUE-SHAPE torch
checkpoints (image Swin-B 2D + HF bert-base BertForPreTraining) ->
tools/convert_checkpoint.py (2D->3D inflation) -> parity gates (text
tower / patch embed / MLM head vs torch) -> full-size 224^2/8-frame
retrieval eval through tools/test.py --load-from. With real weights the
only change is the two .pth paths (VERDICT r2 item 4's one-shot recipe).
"""

import os
import subprocess
import sys

import pytest

pytest.importorskip("torch")
pytest.importorskip("transformers")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_dress_rehearsal_end_to_end(tmp_path):
    env = dict(os.environ, USE_TF="0", JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)   # full-size towers: no 8-way device split
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "dress_rehearsal.py"),
         "--work", str(tmp_path)],
        env=env, capture_output=True, text=True, timeout=3600)
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-3000:])
    assert "parity gates pass" in r.stdout
    assert "full-size eval metrics" in r.stdout
    assert "PASS" in r.stdout
