"""Dataset iterator + schema tests (reference dataset.py behaviors)."""

import numpy as np
import pytest

from dpde_tpu.data.datasets import (
    DiffusionForwardIterable,
    DiffusionIterable,
    NoTimeIterable,
    ValidationView,
)


@pytest.fixture()
def toy():
    n, c, h, w, t = 10, 1, 6, 6, 5
    rng = np.random.default_rng(0)
    data = rng.standard_normal((n, c, h, w, t)).astype(np.float32)
    t_steps = np.linspace(0, 1, t).astype(np.float32)
    labels = rng.standard_normal((n, 1)).astype(np.float32)
    return data, t_steps, labels


class TestDiffusionIterable:
    def test_batch_shapes_and_tau(self, toy):
        data, t_steps, labels = toy
        it = DiffusionIterable(data, t_steps, labels, start_at_t0=True,
                               batch_size=4, shuffle=True, seed=0)
        batch = next(iter(it))
        assert batch["X"].shape == (4, 6, 6, 2)       # concat(t0, tf) NHWC
        assert batch["labels"].shape == (4, 2)        # [tau, alpha]
        tau = batch["labels"][:, 0]
        assert (tau >= 0).all() and (tau <= 1.0).all()

    def test_start_at_t0(self, toy):
        data, t_steps, labels = toy
        it = DiffusionIterable(data, t_steps, labels, start_at_t0=True,
                               batch_size=10, shuffle=False, seed=0)
        batch = next(iter(it))
        # t0 snapshot must be data[..., 0]
        want = np.moveaxis(data[:, :, :, :, 0], 1, -1)
        np.testing.assert_allclose(batch["X"][..., :1], want)

    def test_random_t0(self, toy):
        data, t_steps, labels = toy
        it = DiffusionIterable(data, t_steps, labels, start_at_t0=False,
                               batch_size=10, shuffle=False, seed=0)
        b1 = next(iter(it))
        b2 = next(iter(it))
        assert not np.allclose(b1["X"], b2["X"])   # new (t0, tf) each epoch

    def test_tail_dropped(self, toy):
        data, t_steps, labels = toy
        it = DiffusionIterable(data, t_steps, labels, batch_size=4)
        batches = list(it)
        assert len(batches) == 2                      # 10 // 4
        assert all(b["X"].shape[0] == 4 for b in batches)

    def test_no_labels(self, toy):
        data, t_steps, _ = toy
        it = DiffusionIterable(data, t_steps, None, batch_size=4)
        assert next(iter(it))["labels"] is None


class TestForwardIterable:
    def test_obs_and_x_split(self, toy):
        data, t_steps, labels = toy
        it = DiffusionForwardIterable(data, t_steps, labels, batch_size=5,
                                      shuffle=False, seed=0)
        b = next(iter(it))
        assert b["obs"].shape == (5, 6, 6, 1)
        assert b["X"].shape == (5, 6, 6, 1)
        assert b["labels"].shape == (5, 2)


class TestNoTimeIterable:
    def test_first_last_concat(self, toy):
        data, _, labels = toy
        it = NoTimeIterable(data, labels, batch_size=10, shuffle=False)
        b = next(iter(it))
        want0 = np.moveaxis(data[..., 0], 1, -1)
        want1 = np.moveaxis(data[..., -1], 1, -1)
        np.testing.assert_allclose(b["X"][..., :1], want0)
        np.testing.assert_allclose(b["X"][..., 1:], want1)


class TestValidationView:
    def test_expansion_excluding_t0(self, toy):
        data, t_steps, labels = toy
        v = ValidationView(data, t_steps, labels, time_as_label=True)
        assert len(v) == 10 * 4                       # N * (T-1)
        b = next(v.batches(batch_size=4))
        assert b["A"].shape == (4, 6, 6, 1)
        assert b["U"].shape == (4, 6, 6, 1)
        assert b["labels"].shape == (4, 2)            # [t, alpha]
        # first item: A = data[0, ..., 0], U = data[0, ..., 1], t = t_steps[1]
        np.testing.assert_allclose(
            b["A"][0], np.moveaxis(data[0, :, :, :, 0], 0, -1))
        np.testing.assert_allclose(
            b["U"][0], np.moveaxis(data[0, :, :, :, 1], 0, -1))
        assert b["labels"][0, 0] == t_steps[1]

    def test_include_t0(self, toy):
        data, t_steps, labels = toy
        v = ValidationView(data, t_steps, labels, time_as_label=True,
                           include_t0_as_target=True)
        assert len(v) == 10 * 5

    def test_too_few_tsteps_raises(self, toy):
        data, _, labels = toy
        with pytest.raises(ValueError):
            ValidationView(data[..., :1], np.zeros(1), labels)

    def test_limit(self, toy):
        data, t_steps, labels = toy
        v = ValidationView(data, t_steps, labels)
        items = sum(b["A"].shape[0] for b in v.batches(8, limit=11))
        assert items == 11


class TestShardStore:
    """Restartable datagen (reference mitigates interruption via
    interval-sharded worker files, llg.py:195-264; here an atomic
    per-batch shard store)."""

    def test_resume_skips_complete_shards(self, tmp_path):
        from dpde_tpu.data.io import ShardStore

        final = tmp_path / "out.hdf5"
        st = ShardStore(final)
        a0 = np.arange(6, dtype=np.float32).reshape(2, 3)
        st.save(0, a0)
        assert st.has(0) and not st.has(2)
        np.testing.assert_array_equal(st.load(0), a0)

        # a fresh store (new process) sees the same shards
        st2 = ShardStore(final)
        assert st2.has(0)
        st2.save(2, a0 + 1)
        np.testing.assert_array_equal(st2.load(2), a0 + 1)

        st2.finalize()
        assert not st2.dir.exists()

    def test_no_partial_shards_visible(self, tmp_path):
        """Atomicity: only completed renames count as shards."""
        from dpde_tpu.data.io import ShardStore

        st = ShardStore(tmp_path / "x.hdf5")
        st.dir.mkdir(parents=True)
        np.save(st.dir / "shard_0000000.tmp.npy", np.zeros(3))
        assert not st.has(0)
