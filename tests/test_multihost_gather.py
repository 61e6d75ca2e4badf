"""Multi-host eval gather: per-process (possibly ragged) shards -> global
dedup'd results. Pad+count protocol per the reference's
VariedShapeGatherLoss contract (gather_loss.py:25-70)."""

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


def test_pad_strip_roundtrip():
    """The pure pad/strip halves of the ragged protocol."""
    shards = [np.arange(4.0).reshape(2, 2), np.arange(6.0).reshape(3, 2) + 10]
    counts = np.array([2, 3])
    max_n = 3
    stacked = np.stack([EL._pad_rows(s, max_n) for s in shards])
    assert stacked.shape == (2, 3, 2)
    out = EL._strip_rank_padding(stacked, counts)
    np.testing.assert_array_equal(out, np.concatenate(shards))
    # equal-count fast shape too
    same = np.stack([EL._pad_rows(shards[1], 3)] * 2)
    np.testing.assert_array_equal(
        EL._strip_rank_padding(same, np.array([3, 3])),
        np.concatenate([shards[1]] * 2))


class _FakeMH:
    """Emulates 2 processes with RAGGED result counts (rank0: 2, rank1: 3).

    process_allgather sees only rank 0's local value; the fake supplies
    rank 1's matching contribution: counts for the 0-d call, the padded
    peer shard (identified by ndim) otherwise.
    """

    rank1 = {
        2: np.array([[2.0], [0.5], [7.0]]),       # embeddings (3, 1)
        1: np.array([2, 0, 3]),                    # indices (3,) — dup of 0
    }

    @classmethod
    def process_allgather(cls, x, tiled=False):
        x = np.asarray(x)
        if x.ndim == 0:
            return np.array([2, 3])  # per-rank counts
        peer = EL._pad_rows(cls.rank1[x.ndim], x.shape[0])
        return np.stack([x, peer])


def test_host_gather_ragged_multiprocess_simulated(monkeypatch):
    """2 simulated processes with different result counts: the gather must
    pad+count+strip so downstream index-dedup sees the full result set."""
    import jax.experimental

    monkeypatch.setattr(EL.jax, "process_count", lambda: 2)
    monkeypatch.setattr(jax.experimental, "multihost_utils", _FakeMH,
                        raising=False)

    local_v = np.array([[0.0], [1.0]])
    local_idx = np.array([0, 1])
    v, idx = EL._host_gather(local_v, local_idx)
    assert v.shape == (5, 1)
    np.testing.assert_array_equal(idx, [0, 1, 2, 0, 3])
    # dedup removes the cross-rank duplicate of index 0 and sorts by index
    (v_sorted,) = EL._dedup_sort(idx, v)
    np.testing.assert_array_equal(v_sorted[:, 0], [0.0, 1.0, 2.0, 7.0])
