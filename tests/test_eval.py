"""Mask generator + test-loop + Karras grid tests."""

from pathlib import Path

import numpy as np
import pytest

from dpde_tpu.eval.masks import (
    combine_masks,
    random_boundary_mask,
    random_interior_mask,
)
from dpde_tpu.sampling.karras import karras_sigmas


class TestMasks:
    def test_boundary_only_on_ring(self):
        m = random_boundary_mask(8, 10, frac_obs=0.5,
                                 rng=np.random.default_rng(0))
        assert not m[1:-1, 1:-1].any()
        n_expected = int(0.5 * (2 * 8 + 2 * 10 - 4))
        assert m.sum() == n_expected

    def test_boundary_full_and_empty(self):
        assert random_boundary_mask(6, 6, frac_obs=1.0).sum() == 4 * 6 - 4
        assert random_boundary_mask(6, 6, frac_obs=0.0).sum() == 0

    def test_no_corners(self):
        m = random_boundary_mask(6, 6, frac_obs=1.0, include_corners=False)
        assert not m[0, 0] and not m[-1, -1]

    def test_interior_only_inside(self):
        m = random_interior_mask(8, 8, frac_obs=0.25,
                                 rng=np.random.default_rng(1))
        assert not m[0, :].any() and not m[:, 0].any()
        assert m.sum() == int(0.25 * 36)

    def test_n_overrides_frac(self):
        m = random_interior_mask(8, 8, n=5, rng=np.random.default_rng(2))
        assert m.sum() == 5

    def test_n_too_large_raises(self):
        with pytest.raises(ValueError):
            random_interior_mask(4, 4, n=100)

    def test_combine(self):
        a = np.zeros((4, 4), bool)
        a[0, 0] = True
        b = np.zeros((4, 4), bool)
        b[1, 1] = True
        c = combine_masks(a, b)
        assert c.sum() == 2
        with pytest.raises(ValueError):
            combine_masks()


class TestKarras:
    def test_formula_matches_reference(self):
        """sigma_i = (smax^(1/rho)+i/(N-1)(smin^(1/rho)-smax^(1/rho)))^rho,
        last entry 0 (reference sample.py:209-212)."""
        sig = karras_sigmas(50, 0.002, 80.0, 7.0)
        assert sig.shape == (51,)
        assert sig[0] == pytest.approx(80.0, rel=1e-12)
        assert sig[-2] == pytest.approx(0.002, rel=1e-12)
        assert sig[-1] == 0.0
        i = np.arange(50, dtype=np.float64)
        want = (80.0 ** (1 / 7) + i / 49 * (0.002 ** (1 / 7)
                                            - 80.0 ** (1 / 7))) ** 7
        np.testing.assert_allclose(sig[:-1], want, rtol=1e-14)
        assert (np.diff(sig) < 0).all()


class TestTestLoop:
    def test_metrics_accumulate(self, tmp_path):
        """test_loop with a fake sampler: check MAE/std bookkeeping and the
        npz output (reference model_testing.py:162-239 accounting)."""
        from dpde_tpu.data.datasets import ValidationView
        from dpde_tpu.eval.test_loop import test_loop

        rng = np.random.default_rng(0)
        data = rng.standard_normal((3, 1, 8, 8, 3)).astype(np.float32)
        t_steps = np.asarray([0.0, 0.5, 1.0], np.float32)
        view = ValidationView(data, t_steps, np.ones((3, 1), np.float32),
                              time_as_label=True)

        class FakeSampler:
            sample_shape = (8, 8)
            num_channels = 2
            num_samples = 4

            def sample(self, key, labels, obs_a, obs_u, mask_a, mask_u,
                       za, zu, zp, return_losses=False):
                # returns obs exactly -> MAE must be 0
                x = np.concatenate([obs_a, obs_u], axis=-1)
                return x, None

        out = test_loop(FakeSampler(), view, 1.0, 1.0, 1.0,
                        wandb_kwargs={"mode": "disabled",
                                      "dir": str(tmp_path)},
                        items_per_batch=2, max_num_samples=5,
                        save_path=tmp_path / "validation_data.npz")
        assert out["MAE"].shape == (5, 2, 8, 8)
        np.testing.assert_allclose(out["MAE"], 0.0, atol=1e-7)
        np.testing.assert_allclose(out["std"], 0.0, atol=1e-7)
        assert np.isfinite(out["ch_rel_error"]).all()
        assert (tmp_path / "validation_data.npz").exists()
        loaded = np.load(tmp_path / "validation_data.npz")
        assert set(loaded.files) == {"MAE", "denom_abs", "denom_range",
                                     "std"}

    def test_resume_from_partial(self, tmp_path):
        """Watchdog insurance (round 5): a test_loop restart must skip the
        batches already flushed to .partial.npz, reproduce the identical
        key stream for the rest, and delete the partial on success."""
        from dpde_tpu.data.datasets import ValidationView
        from dpde_tpu.eval.test_loop import test_loop

        rng = np.random.default_rng(3)
        data = rng.standard_normal((4, 1, 8, 8, 3)).astype(np.float32)
        t_steps = np.asarray([0.0, 0.5, 1.0], np.float32)
        view = ValidationView(data, t_steps, np.ones((4, 1), np.float32),
                              time_as_label=True)

        calls = []

        class KeyedSampler:
            sample_shape = (8, 8)
            num_channels = 2
            num_samples = 2

            def sample(self, key, labels, obs_a, obs_u, mask_a, mask_u,
                       za, zu, zp, return_losses=False):
                calls.append(np.asarray(key).tolist())
                x = np.concatenate([obs_a, obs_u], axis=-1)
                # key-dependent perturbation: resumed run must produce
                # bit-identical outputs for the remaining batches
                x = x + np.float32(np.asarray(key)[-1] % 7) * 1e-3
                return x, None

        kwargs = dict(
            wandb_kwargs={"mode": "disabled", "dir": str(tmp_path)},
            items_per_batch=2, max_num_samples=8,
            save_path=tmp_path / "validation_data.npz")

        full = test_loop(KeyedSampler(), view, 1.0, 1.0, 1.0, **kwargs)
        keys_full = list(calls)
        assert not (tmp_path / "validation_data.npz.partial.npz").exists()

        # fake an interrupted run: partial flush covering the first 4 items
        np.savez(str(tmp_path / "validation_data.npz") + ".partial.npz",
                 MAE=full["MAE"][:4], denom_abs=full["denom_abs"][:4],
                 denom_range=full["denom_range"][:4], std=full["std"][:4])
        calls.clear()
        resumed = test_loop(KeyedSampler(), view, 1.0, 1.0, 1.0, **kwargs)

        assert keys_full[2:] == calls          # first 2 batches skipped
        np.testing.assert_array_equal(resumed["MAE"], full["MAE"])
        np.testing.assert_array_equal(resumed["std"], full["std"])
        assert not (tmp_path / "validation_data.npz.partial.npz").exists()


class TestWatchdog:
    def test_kills_stalled_and_restarts(self, tmp_path):
        """A child whose CPU time freezes (pure sleep) must be killed and
        relaunched; a marker file makes the second attempt exit 0."""
        import subprocess
        import sys

        marker = tmp_path / "attempt"
        prog = (
            "import os, sys, time\n"
            f"m = {str(marker)!r}\n"
            "if os.path.exists(m):\n"
            "    sys.exit(0)\n"
            "open(m, 'w').close()\n"
            "time.sleep(600)\n"   # frozen CPU time -> watchdog kill
        )
        r = subprocess.run(
            [sys.executable, "tools/watchdog.py", "--stall-s", "3",
             "--poll-s", "1", "--cooloff-s", "1", "--max-restarts", "1",
             "--", sys.executable, "-c", prog],
            capture_output=True, text=True, timeout=120,
            cwd=str(Path(__file__).resolve().parents[1]))
        assert r.returncode == 0, r.stderr
        assert "CPU time frozen" in r.stderr
        assert "cooling off" in r.stderr

    def test_passes_through_exit_code(self):
        import subprocess
        import sys

        r = subprocess.run(
            [sys.executable, "tools/watchdog.py", "--stall-s", "30",
             "--", sys.executable, "-c", "import sys; sys.exit(5)"],
            capture_output=True, text=True, timeout=60,
            cwd=str(Path(__file__).resolve().parents[1]))
        assert r.returncode == 5


class TestTunerObjectives:
    def test_objective_kinds(self):
        """rel = eval-harness relative error; maxratio = worst channel
        ratio vs the r4 anchor (tools/tune_sampler.py round-5)."""
        import sys
        sys.path.insert(0, str(Path(__file__).resolve().parents[1]
                               / "tools"))
        from tune_sampler import make_objective

        class Fake:
            sample_shape = (8, 8)
            num_channels = 2
            num_samples = 2
            ch_a = 1

            def sample(self, key, lab, oa, ou, ma, mu, za, zu, zp,
                       latents=None):
                # constant offset of za from the truth on ch0 only
                b = oa.shape[0]
                out = np.concatenate([oa + float(za), ou], axis=-1)
                return out, None

        from dpde_tpu.data.datasets import ValidationView
        rng = np.random.default_rng(0)
        data = rng.standard_normal((4, 1, 8, 8, 3)).astype(np.float32)
        view = ValidationView(data, np.asarray([0., .5, 1.], np.float32),
                              np.ones((4, 1), np.float32),
                              time_as_label=True)
        m = np.zeros((8, 8), bool)
        obj_rel = make_objective(Fake(), view, (m, m), 2, 0, kind="rel")
        obj_mr = make_objective(Fake(), view, (m, m), 2, 0,
                                kind="maxratio")
        # zero offset -> perfect ch0; rel/maxratio reflect only ch1=0
        assert obj_rel((0.0, 0.0, 0.0)) == 0.0
        assert obj_mr((0.0, 0.0, 0.0)) == 0.0
        # bigger offset -> strictly worse, and maxratio scales by anchor
        a1, a2 = obj_mr((0.1, 0, 0)), obj_mr((0.2, 0, 0))
        assert 0 < a1 < a2
        r1 = obj_rel((0.1, 0, 0))
        # rel = mean over channels (ch1 contributes 0) -> rel_a = 2*rel;
        # maxratio = rel_a / anchor_a
        assert a1 == pytest.approx(r1 * 2 / 0.0050, rel=1e-5)
