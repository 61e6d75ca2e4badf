"""Load the reference's OWN torch modules from /root/reference for parity.

VERDICT r3 item 1: every parity claim previously rested on re-derived
goldens (numpy loops, HF towers). This shim lets the reference code itself
run next to clover_tpu in this image: ``torch``/``transformers``/``einops``
are present; only ``timm`` and ``mmcv`` are missing, and the reference
modules touch just a handful of names from them
(swin_transformer_3d.py:1-15, cross_transformer.py:1-9,
contrastive_loss.py:1-8, recognizers/base.py:1-14).

Mechanics: stub packages are inserted into ``sys.modules`` so the reference
files' absolute (``mmaction.core.hooks.fp16_utils``) and relative
(``from ..builder import BACKBONES``) imports resolve to the stubs, then
each reference file is exec'd from its real path under its real dotted
name. Nothing from the reference is copied — its own .py files run.

The stubs provide only what the imported files actually use:
- ``timm.models.layers``: DropPath (stochastic depth; identity in eval /
  p=0, the only setting parity tests run), trunc_normal_ (init only —
  parity tests overwrite all weights with shared converted values).
- ``mmcv.runner``: load_checkpoint/load_state_dict no-ops (tests never
  pass a checkpoint path), get_dist_info from torch.distributed.
- ``mmcv.utils``: print_log no-op, _BatchNorm/_InstanceNorm re-exported
  from torch (recognizers/base.py uses them only in isinstance checks).
- ``mmaction.core.hooks.fp16_utils``: auto_fp16/force_fp32 as pass-through
  decorators (the reference runs them disabled unless fp16 hooks enable
  them; parity is fp32).
- ``mmaction.models.builder``: a minimal type-keyed registry so
  ``@BACKBONES.register_module()`` and ``build_backbone(cfg)`` work.
"""

from __future__ import annotations

import importlib.machinery
import importlib.util
import logging
import sys
import types

import torch
import torch.nn as nn

REF_ROOT = "/root/reference/mmaction"


class _Registry:
    """Minimal stand-in for mmcv.Registry: register by class name, build
    by popping cfg['type'] (mmaction/models/builder.py:9-57)."""

    def __init__(self):
        self._modules = {}

    def register_module(self, *args, **kwargs):
        def deco(cls):
            self._modules[cls.__name__] = cls
            return cls

        if args and isinstance(args[0], type):
            return deco(args[0])
        return deco

    def __contains__(self, name):
        return name in self._modules

    def get(self, name):
        return self._modules[name]

    def build(self, cfg):
        cfg = dict(cfg)
        return self._modules[cfg.pop("type")](**cfg)


class _DropPath(nn.Module):
    """timm stochastic depth; identity at eval time or drop_prob=0 (the
    parity setting — tests run the reference model in eval mode)."""

    def __init__(self, drop_prob=0.0):
        super().__init__()
        self.drop_prob = float(drop_prob or 0.0)

    def forward(self, x):
        if self.drop_prob == 0.0 or not self.training:
            return x
        keep = 1.0 - self.drop_prob
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = x.new_empty(shape).bernoulli_(keep)
        return x * mask / keep


def _trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
    return nn.init.trunc_normal_(tensor, mean=mean, std=std, a=a, b=b)


def _passthrough_decorator(*dargs, **dkwargs):
    """auto_fp16 / force_fp32 factory -> identity decorator."""

    def deco(fn):
        return fn

    return deco


def _noop(*args, **kwargs):
    return None


def _get_dist_info():
    import torch.distributed as dist

    if dist.is_available() and dist.is_initialized():
        return dist.get_rank(), dist.get_world_size()
    return 0, 1


def _module(name, **attrs):
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        mod.__path__ = []  # mark as package so dotted submodules resolve
        # a real ModuleSpec so importlib.util.find_spec probes (e.g.
        # transformers' _is_package_available("timm")) don't choke
        mod.__spec__ = importlib.machinery.ModuleSpec(name, None, is_package=True)
        sys.modules[name] = mod
        parent, _, leaf = name.rpartition(".")
        if parent and parent in sys.modules:
            setattr(sys.modules[parent], leaf, mod)
    for key, val in attrs.items():
        setattr(mod, key, val)
    return mod


def install_shims():
    if "mmaction.models.builder" in sys.modules:
        return

    _module("timm")
    _module("timm.models")
    _module("timm.models.layers", DropPath=_DropPath, trunc_normal_=_trunc_normal_)

    from torch.nn.modules.batchnorm import _BatchNorm
    from torch.nn.modules.instancenorm import _InstanceNorm

    _module("mmcv")
    _module(
        "mmcv.runner",
        load_checkpoint=_noop,
        load_state_dict=_noop,
        get_dist_info=_get_dist_info,
        force_fp32=_passthrough_decorator,
    )
    _module(
        "mmcv.utils",
        print_log=_noop,
        _BatchNorm=_BatchNorm,
        _InstanceNorm=_InstanceNorm,
    )

    _module("mmaction")
    _module(
        "mmaction.utils",
        get_root_logger=lambda *a, **k: logging.getLogger("reference"),
    )
    _module("mmaction.core")
    _module("mmaction.core.hooks")
    _module(
        "mmaction.core.hooks.fp16_utils",
        auto_fp16=_passthrough_decorator,
        force_fp32=_passthrough_decorator,
    )

    models = _module("mmaction.models")
    registry = _Registry()
    builder = _module(
        "mmaction.models.builder",
        MODELS=registry,
        BACKBONES=registry,
        HEADS=registry,
        LOSSES=registry,
        RECOGNIZERS=registry,
        build_backbone=registry.build,
        build_head=lambda cfg: registry.build(cfg) if cfg else None,
        build_loss=lambda cfg: registry.build(cfg) if cfg else None,
    )
    models.builder = builder

    for pkg in ("utils", "backbones", "heads", "losses", "recognizers"):
        _module(f"mmaction.models.{pkg}")

    # the real gather_loss (imports only torch) backs contrastive_loss
    load_ref("models/utils/gather_loss.py", "mmaction.models.utils.gather_loss")


def load_ref(relpath: str, dotted: str):
    """Exec a reference file from its real path under its dotted name so
    its relative imports resolve against the stub packages."""
    install_shims()
    existing = sys.modules.get(dotted)
    if existing is not None and getattr(existing, "__file__", None):
        return existing
    spec = importlib.util.spec_from_file_location(dotted, f"{REF_ROOT}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[dotted] = mod
    try:
        spec.loader.exec_module(mod)
    except Exception:
        del sys.modules[dotted]
        raise
    parent, _, leaf = dotted.rpartition(".")
    setattr(sys.modules[parent], leaf, mod)
    return mod


def ensure_world1_process_group(tmp_file: str):
    """Single-process gloo group so GatherLoss's unconditional
    dist.all_gather (gather_loss.py:11-13) runs for real at world=1."""
    import torch.distributed as dist

    if not dist.is_initialized():
        dist.init_process_group(
            "gloo", init_method=f"file://{tmp_file}", rank=0, world_size=1
        )


def local_bert_factories(hidden_size=768, num_layers=12, heads=12,
                         intermediate=None, vocab_size=30522, seed=0):
    """Replace the reference's ``BertConfig.from_pretrained`` /
    ``Bert*.from_pretrained`` globals (network-dependent,
    cross_transformer.py:24-26, bert_from_hugface.py:13-15,
    mlm_itm_head.py:33-35) with factories that build local random-weight
    HF models at the requested shape. Returns (FakeBertConfig, FakeModelCls
    factory dict) suitable for monkeypatching module globals.
    """
    import transformers

    base_kwargs = dict(
        vocab_size=vocab_size,
        hidden_size=hidden_size,
        num_hidden_layers=num_layers,
        num_attention_heads=heads,
        intermediate_size=intermediate or hidden_size * 4,
        max_position_embeddings=512,
        type_vocab_size=2,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )

    class FakeBertConfig(transformers.BertConfig):
        @classmethod
        def from_pretrained(cls, name, **overrides):
            kwargs = dict(base_kwargs)
            kwargs.update(overrides)
            return cls(**kwargs)

    calls = {"n": 0}  # distinct weights per from_pretrained call

    def _factory(hf_cls):
        class Fake(hf_cls):
            @classmethod
            def from_pretrained(cls, name, config=None, **kw):
                torch.manual_seed(seed + calls["n"])
                calls["n"] += 1
                cfg = config or FakeBertConfig.from_pretrained(name)
                model = cls(cfg)
                model.eval()
                return model

        Fake.__name__ = hf_cls.__name__
        return Fake

    return FakeBertConfig, {
        "BertModel": _factory(transformers.BertModel),
        "BertForPreTraining": _factory(transformers.BertForPreTraining),
        "BertForMaskedLM": _factory(transformers.BertForMaskedLM),
    }
