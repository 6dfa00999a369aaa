"""Partial (shape-tolerant) pretrained loading for cross-architecture
fine-tunes — the heat(2ch) -> LLG(6ch) warm start of BASELINE configs[3].
Strict loading stays the default (reference fine_tune.py:75-77 semantics).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from dpde_tpu.training.checkpoint import (
    CheckpointManager,
    load_pretrained_params,
)


@pytest.fixture()
def saved(tmp_path):
    params = {
        "enc_in": {"kernel": jnp.ones((3, 3, 2, 8)), "bias": jnp.zeros(8)},
        "body": {"kernel": jnp.full((3, 3, 8, 8), 2.0)},
    }
    ckpt = CheckpointManager(tmp_path)
    ckpt.save_params("model", params)
    return tmp_path / "model", params


def test_strict_roundtrip(saved):
    path, params = saved
    template = {
        "enc_in": {"kernel": jnp.zeros((3, 3, 2, 8)), "bias": jnp.ones(8)},
        "body": {"kernel": jnp.zeros((3, 3, 8, 8))},
    }
    out = load_pretrained_params(path, template)
    np.testing.assert_array_equal(out["body"]["kernel"],
                                  params["body"]["kernel"])


def test_partial_merges_matching_and_keeps_mismatched(saved):
    path, _ = saved
    # LLG-style template: enc_in widened 2ch -> 6ch, body unchanged
    template = {
        "enc_in": {"kernel": jnp.full((3, 3, 6, 8), 9.0),
                   "bias": jnp.full((8,), 9.0)},
        "body": {"kernel": jnp.zeros((3, 3, 8, 8))},
    }
    out, report = load_pretrained_params(path, template, partial=True)
    # matching leaves taken from the checkpoint
    np.testing.assert_array_equal(out["body"]["kernel"],
                                  np.full((3, 3, 8, 8), 2.0))
    np.testing.assert_array_equal(out["enc_in"]["bias"], np.zeros(8))
    # mismatched leaf keeps the template init
    np.testing.assert_array_equal(out["enc_in"]["kernel"],
                                  np.full((3, 3, 6, 8), 9.0))
    assert "enc_in/kernel" in report["skipped"]
    assert "body/kernel" in report["loaded"]


def test_partial_with_nothing_matching(saved):
    path, _ = saved
    template = {"other": jnp.zeros((4,))}
    out, report = load_pretrained_params(path, template, partial=True)
    assert report["loaded"] == []
    np.testing.assert_array_equal(out["other"], np.zeros(4))
