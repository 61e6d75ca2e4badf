"""Config-path wiring of fsdp + tensor-parallel shardings.

Unit-level: combined_param_shardings merges Megatron TP rules with the
FSDP largest-free-dim rule. End-to-end: tools/train.py accepts a
``parallel`` config section and trains on a (data, fsdp, model) mesh
(8 virtual CPU devices via conftest).
"""

import os
import subprocess
import sys

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from clover_tpu.parallel.mesh import make_mesh
from clover_tpu.parallel.sharding import combined_param_shardings

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(axis_sizes=(2, 2, 2),
                     axis_names=("data", "fsdp", "model"),
                     devices=jax.devices()[:8])


def test_combined_shardings_tp_wins_fsdp_fills(mesh):
    params = {
        "encoder": {
            "query": {"kernel": np.zeros((256, 256), np.float32),
                      "bias": np.zeros((256,), np.float32)},
            "output": {"kernel": np.zeros((256, 256), np.float32)},
            "embed": {"kernel": np.zeros((512, 512), np.float32)},
            "norm": {"scale": np.zeros((256,), np.float32)},
        }
    }
    sh = combined_param_shardings(params, mesh, min_size=1024)
    enc = sh["encoder"]
    # TP column rule + fsdp composes on the free dim
    assert tuple(enc["query"]["kernel"].spec) == ("fsdp", "model")
    # TP row rule
    assert tuple(enc["output"]["kernel"].spec)[0] == "model"
    # no TP rule -> fsdp largest-dim
    assert "fsdp" in tuple(enc["embed"]["kernel"].spec)
    assert "model" not in tuple(enc["embed"]["kernel"].spec)
    # small params replicated
    assert tuple(enc["norm"]["scale"].spec) in ((), (None,))
    # bias of a column-parallel layer follows the output split
    assert tuple(enc["query"]["bias"].spec) == ("model",)


def test_combined_shardings_single_axis_degenerates():
    m = make_mesh(axis_sizes=(8, 1, 1),
                  axis_names=("data", "fsdp", "model"),
                  devices=jax.devices()[:8])
    params = {"w": {"kernel": np.zeros((256, 256), np.float32)}}
    sh = combined_param_shardings(params, m, min_size=1024)
    assert tuple(sh["w"]["kernel"].spec) in ((), (None, None))


def test_act_sharding_parity_under_mesh():
    """H-sharded Swin forward (act_sharding + set_mesh) == unsharded."""
    import dataclasses

    import jax.numpy as jnp

    from clover_tpu.models.swin3d import SwinConfig, SwinTransformer3D

    cfg = SwinConfig(patch_size=(1, 2, 2), stride=(1, 2, 2), embed_dim=8,
                     depths=(1, 1), num_heads=(2, 2), window_size=(2, 2, 2),
                     drop_path_rate=0.0)
    x = np.random.default_rng(0).normal(size=(2, 2, 16, 8, 3)).astype(
        np.float32)
    model = SwinTransformer3D(cfg)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x))["params"]
    ref = jax.jit(lambda p, v: model.apply({"params": p}, v))(params, x)

    sp_cfg = dataclasses.replace(
        cfg, act_sharding=("data", None, "sp", None, None))
    sp_model = SwinTransformer3D(sp_cfg)
    mesh = make_mesh(axis_sizes=(2, 2), axis_names=("data", "sp"),
                     devices=jax.devices()[:4])
    with jax.set_mesh(mesh):
        out = jax.jit(lambda p, v: sp_model.apply({"params": p}, v))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_act_sharding_inactive_without_mesh():
    import dataclasses

    import jax.numpy as jnp

    from clover_tpu.models.swin3d import SwinConfig, SwinTransformer3D

    cfg = SwinConfig(patch_size=(1, 2, 2), stride=(1, 2, 2), embed_dim=8,
                     depths=(1,), num_heads=(2,), window_size=(2, 2, 2),
                     drop_path_rate=0.0,
                     act_sharding=("data", None, "sp", None, None))
    x = jnp.zeros((1, 2, 8, 8, 3))
    model = SwinTransformer3D(cfg)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    out = model.apply({"params": params}, x)   # no mesh context: no-op
    assert out.shape[0] == 1


@pytest.mark.slow
def test_train_cli_with_sequence_parallel(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    work_dir = str(tmp_path / "run_sp")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         os.path.join(REPO, "configs", "exp", "debug_retrieval_synthetic.py"),
         "--work-dir", work_dir, "--cpu",
         "--cfg-options", "parallel.sequence=2", "total_epochs=1"],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(work_dir, "metrics.jsonl"))


@pytest.mark.slow
def test_train_cli_with_parallel_section(tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    work_dir = str(tmp_path / "run")
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "train.py"),
         os.path.join(REPO, "configs", "exp", "debug_retrieval_synthetic.py"),
         "--work-dir", work_dir, "--cpu",
         "--cfg-options", "parallel.fsdp=2", "parallel.model=2",
         "total_epochs=1"],
        env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(os.path.join(work_dir, "metrics.jsonl"))


def test_make_hybrid_mesh_single_slice_fallback():
    """Without slice metadata (CPU devices) the hybrid mesh degrades to a
    flat ICI mesh with the requested axis sizes."""
    from clover_tpu.parallel.mesh import make_hybrid_mesh

    m = make_hybrid_mesh((2, 2, 2, 1))
    assert dict(zip(m.axis_names, m.devices.shape)) == {
        "data": 2, "fsdp": 2, "model": 2, "sp": 1}
