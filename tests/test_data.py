"""Dataset iterator + schema tests (reference dataset.py behaviors)."""

from pathlib import Path

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


class TestModifyDataset:
    """tools/modify_dataset.py — the reference's modify_datasets.ipynb
    workflows (llg_test2 stride-4, heat_no_time first/last) as a script."""

    def _write(self, path):
        import h5py

        rng = np.random.default_rng(0)
        with h5py.File(path, "w") as f:
            f.create_dataset("A", data=rng.standard_normal((4, 1, 8, 8)))
            f.create_dataset(
                "U", data=rng.standard_normal((4, 1, 8, 8, 9)))
            f.create_dataset("labels", data=rng.standard_normal((4, 2)))
            f.create_dataset("t_steps", data=np.linspace(0, 1, 9))
            f.attrs["T"] = 1.0
            f.attrs["dx"] = 0.1
            f.attrs["t_per_step"] = 0.125
            f.attrs["N"] = 4

    def test_stride_and_first_last(self, tmp_path):
        import sys

        import h5py

        sys.path.insert(0, str(Path(__file__).resolve().parents[1]
                               / "tools"))
        from modify_dataset import modify

        src = tmp_path / "src.hdf5"
        self._write(src)

        info = modify(src, tmp_path / "s4.hdf5", stride=4)
        assert info["shape"][-1] == 3            # steps 0, 4, 8
        with h5py.File(tmp_path / "s4.hdf5") as f:
            np.testing.assert_allclose(f["t_steps"][:], [0.0, 0.5, 1.0])
            assert f.attrs["t_per_step"] == 0.5
            assert f["A"].shape == (4, 1, 8, 8)

        info = modify(src, tmp_path / "fl.hdf5", first_last=True, n=2)
        assert info == {"N": 2, "T": 2, "shape": (2, 1, 8, 8, 2)}
        with h5py.File(tmp_path / "fl.hdf5") as f:
            assert "t_per_step" not in f.attrs
            np.testing.assert_allclose(f["t_steps"][:], [0.0, 1.0])

    def test_derived_file_loads_via_io(self, tmp_path):
        import sys

        sys.path.insert(0, str(Path(__file__).resolve().parents[1]
                               / "tools"))
        from modify_dataset import modify

        from dpde_tpu.data.io import load_data

        src = tmp_path / "src.hdf5"
        self._write(src)
        modify(src, tmp_path / "out.hdf5", stride=2)
        raw = load_data(tmp_path / "out.hdf5")
        assert raw.u.shape == (4, 1, 8, 8, 5)
        assert raw.t_steps.shape == (5,)
