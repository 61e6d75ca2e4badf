"""Multi-host eval gather: per-process shards -> global dedup'd results."""

import numpy as np

import clover_tpu.engine.eval_loop as EL


def test_host_gather_identity_single_process():
    a = np.arange(6).reshape(3, 2)
    b = np.arange(3)
    out_a, out_b = EL._host_gather(a, b)
    np.testing.assert_array_equal(out_a, a)
    np.testing.assert_array_equal(out_b, b)
    # single-array form returns the array, not a list
    np.testing.assert_array_equal(EL._host_gather(a), a)


def test_host_gather_multiprocess_simulated(monkeypatch):
    """Simulate 2 processes: gather must concatenate per-host shards so the
    downstream index-dedup sees the full (padded) result set."""
    shards = {
        0: (np.array([[0.0], [1.0]]), np.array([0, 1])),
        1: (np.array([[2.0], [0.5]]), np.array([2, 0])),  # rank-pad dup of 0
    }

    class FakeMH:
        @staticmethod
        def process_allgather(x, tiled=False):
            assert tiled
            # emulate: every process contributes its shard, concatenated
            if x.ndim == 2:
                return np.concatenate([shards[0][0], shards[1][0]])
            return np.concatenate([shards[0][1], shards[1][1]])

    monkeypatch.setattr(EL.jax, "process_count", lambda: 2)
    import jax.experimental

    monkeypatch.setattr(jax.experimental, "multihost_utils", FakeMH,
                        raising=False)

    v, idx = EL._host_gather(*shards[0])
    assert v.shape == (4, 1)
    # dedup removes the padded duplicate of index 0 and sorts by index
    (v_sorted,) = EL._dedup_sort(idx, v)
    np.testing.assert_array_equal(v_sorted[:, 0], [0.0, 1.0, 2.0])
