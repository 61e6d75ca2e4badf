import os

import pytest

from clover_tpu.config import (
    Config,
    apply_overrides,
    load_config,
    merge_dict,
    parse_cfg_options,
)


def _write(tmp_path, name, text):
    p = tmp_path / name
    p.write_text(text)
    return str(p)


def test_base_inheritance_and_override(tmp_path):
    _write(tmp_path, "base.py", "a = 1\nmodel = dict(type='X', depth=2, head=dict(dim=4))\n")
    leaf = _write(
        tmp_path,
        "leaf.py",
        "_base_ = ['base.py']\nmodel = dict(depth=3)\nb = 'hi'\n",
    )
    cfg = load_config(leaf)
    assert cfg.a == 1
    assert cfg.b == "hi"
    assert cfg.model.type == "X"
    assert cfg.model.depth == 3
    assert cfg.model.head.dim == 4


def test_delete_key_replaces(tmp_path):
    _write(tmp_path, "base.py", "model = dict(type='X', depth=2)\n")
    leaf = _write(
        tmp_path,
        "leaf.py",
        "_base_ = ['base.py']\nmodel = dict(_delete_=True, type='Y')\n",
    )
    cfg = load_config(leaf)
    assert cfg.model.to_dict() == {"type": "Y"}


def test_multi_base_merge_order(tmp_path):
    _write(tmp_path, "b1.py", "x = 1\ny = 1\n")
    _write(tmp_path, "b2.py", "y = 2\nz = 2\n")
    leaf = _write(tmp_path, "leaf.py", "_base_ = ['b1.py', 'b2.py']\nz = 3\n")
    cfg = load_config(leaf)
    assert (cfg.x, cfg.y, cfg.z) == (1, 2, 3)


def test_nested_base_relative_paths(tmp_path):
    os.makedirs(tmp_path / "sub")
    _write(tmp_path, "root.py", "r = 'root'\n")
    _write(tmp_path / "sub", "mid.py", "_base_ = ['../root.py']\nm = 'mid'\n")
    leaf = _write(tmp_path, "leaf.py", "_base_ = ['sub/mid.py']\n")
    cfg = load_config(leaf)
    assert cfg.r == "root" and cfg.m == "mid"


def test_cli_overrides(tmp_path):
    leaf = _write(tmp_path, "leaf.py", "model = dict(depth=2)\nlr = 1e-3\n")
    opts = parse_cfg_options(["model.depth=5", "lr=0.1", "name=run1"])
    cfg = load_config(leaf, overrides=opts)
    assert cfg.model.depth == 5
    assert cfg.lr == 0.1
    assert cfg.name == "run1"


def test_apply_overrides_creates_nested():
    cfg = Config({"a": {"b": 1}})
    out = apply_overrides(cfg, {"a.c.d": 7})
    assert out.a.b == 1 and out.a.c.d == 7


def test_merge_dict_does_not_mutate():
    base = {"m": {"x": 1}}
    merge_dict(base, {"m": {"x": 2}})
    assert base["m"]["x"] == 1


def test_config_computed_values(tmp_path):
    # configs are python: derived values work (reference pretrain config:12)
    leaf = _write(tmp_path, "leaf.py", "bs = 32\nlr = 5e-5 / bs\n")
    cfg = load_config(leaf)
    assert cfg.lr == pytest.approx(5e-5 / 32)
