"""tools/convert_checkpoint.py end-to-end: torch .pth -> orbax -> model."""

import os
import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_convert_bert_checkpoint_roundtrip(tmp_path):
    hf_cfg = transformers.BertConfig(
        vocab_size=100, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=40, hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0)
    torch.manual_seed(0)
    hf = transformers.BertForMaskedLM(hf_cfg)
    hf.eval()
    pth = str(tmp_path / "bert.pth")
    torch.save(hf.state_dict(), pth)

    out_dir = str(tmp_path / "converted")
    env = dict(os.environ, JAX_PLATFORMS="cpu", USE_TF="0")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "convert_checkpoint.py"),
         "--bert", pth, "--bert-layers", "2", "--fusion-layers", "1",
         "--out", out_dir],
        env=env, capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.isdir(os.path.join(out_dir, "step_0000000000"))

    # restore and check numerics against the HF source
    import orbax.checkpoint as ocp

    import jax.numpy as jnp

    from clover_tpu.models.bert import BertConfig, BertTextEncoder

    payload = ocp.PyTreeCheckpointer().restore(
        os.path.join(out_dir, "step_0000000000"))
    params = payload["params"]["text_backbone"]
    cfg = BertConfig(vocab_size=100, hidden_size=32, num_hidden_layers=2,
                     num_attention_heads=4, intermediate_size=64,
                     max_position_embeddings=40, hidden_dropout=0.0,
                     attention_dropout=0.0)
    ids = np.arange(22).reshape(2, 11) % 100
    mask = np.ones((2, 11), dtype=np.int64)
    out = BertTextEncoder(cfg).apply({"params": params}, jnp.asarray(ids),
                                     jnp.asarray(mask), deterministic=True)
    with torch.no_grad():
        ref = hf.bert(input_ids=torch.tensor(ids),
                      attention_mask=torch.tensor(mask)).last_hidden_state
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=3e-5)
    # fusion + mlm head subtrees present
    assert "multimodal_backbone" in payload["params"]
    assert "mlm_head" in payload["params"]