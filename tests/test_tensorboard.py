"""TensorBoard event writer: hand-encoded TFRecord/Event protos must be
readable by the stock tensorboard reader (reference TensorboardLoggerHook,
configs/_base_/default_runtime.py:2-7)."""

import glob
import os

import numpy as np
import pytest

from clover_tpu.utils.tensorboard import TensorBoardWriter, _masked_crc, crc32c


def test_crc32c_known_vectors():
    # RFC 3720 test vectors
    assert crc32c(b"") == 0x00000000
    assert crc32c(b"a") == 0xC1D04330
    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(bytes(32)) == 0x8A9136AA


def test_events_file_readable_by_stock_tensorboard(tmp_path):
    tb = pytest.importorskip("tensorboard")  # reader only used in the test
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader,
    )

    w = TensorBoardWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.25, step=1)
    w.add_scalar("train/loss", 0.75, step=2)
    w.add_scalars({"lr": 1e-4, "grad_norm": 3.5, "skipme": "str"}, step=2,
                  prefix="train/")
    w.close()

    files = glob.glob(os.path.join(str(tmp_path), "events.out.tfevents.*"))
    assert len(files) == 1
    events = list(EventFileLoader(files[0]).Load())
    assert events[0].file_version == "brain.Event:2"
    # modern readers migrate simple_value -> scalar tensor; accept both
    scalars = [(v.tag, e.step,
                v.tensor.float_val[0] if v.tensor.float_val else v.simple_value)
               for e in events for v in e.summary.value]
    tags = {t for t, _, _ in scalars}
    assert tags == {"train/loss", "train/lr", "train/grad_norm"}
    loss = [(s, v) for t, s, v in scalars if t == "train/loss"]
    assert loss == [(1, 1.25), (2, 0.75)]
    (gn,) = [v for t, _, v in scalars if t == "train/grad_norm"]
    assert np.isclose(gn, 3.5)


def test_metrics_logger_tensorboard_integration(tmp_path):
    from clover_tpu.utils.logging import MetricsLogger

    m = MetricsLogger(str(tmp_path), tensorboard=True)
    m.log({"loss": 2.0, "note": [1, 2]}, step=5, prefix="train ")
    m.close()
    files = glob.glob(os.path.join(str(tmp_path), "tb", "events.out.tfevents.*"))
    assert len(files) == 1
    from tensorboard.backend.event_processing.event_file_loader import (
        EventFileLoader,
    )

    scalars = [(v.tag, e.step,
                v.tensor.float_val[0] if v.tensor.float_val else v.simple_value)
               for e in EventFileLoader(files[0]).Load()
               for v in e.summary.value]
    assert scalars == [("train/loss", 5, 2.0)]
