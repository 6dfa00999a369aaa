"""Model inspection (notebook-equivalent of the reference's
inspect_models.ipynb): construct the configured network, print a
per-module parameter breakdown and totals, and optionally summarise a
checkpoint's weights against it.

    python tools/inspect_models.py dataset=heat_eq_logt_joint model=unetv2
    python tools/inspect_models.py ... '+inspect.checkpoint=pretrained_models/heat_logt_joint/ema_model'
"""

from __future__ import annotations

import logging
import sys
from collections import defaultdict
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax  # noqa: E402

from dpde_tpu.models import init_denoiser  # noqa: E402
from dpde_tpu.utils import enable_compilation_cache, resolve_data_path  # noqa: E402
from dpde_tpu.utils.config import main as config_main  # noqa: E402

logging.basicConfig(level=logging.INFO, format="%(message)s", force=True)
logger = logging.getLogger("inspect_models")


def _keystr(kp) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in kp)


@config_main(config_path="conf", config_name="train")
def main(cfg):
    enable_compilation_cache()
    h = w = int(cfg.dataset.data.get("S", 64)) if hasattr(
        cfg.dataset.data, "get") else 64
    shape = (h, w)
    _, den = init_denoiser(cfg, jax.random.PRNGKey(0), shape,
                           cfg.dataset.net.in_ch)
    flat = jax.tree_util.tree_flatten_with_path(den.params)[0]

    groups = defaultdict(lambda: [0, 0])   # top-level module -> [n, bytes]
    total = 0
    for kp, leaf in flat:
        path = _keystr(kp)
        top = path.split("/")[1] if path.startswith("params/") else \
            path.split("/")[0]
        groups[top][0] += leaf.size
        groups[top][1] += leaf.size * leaf.dtype.itemsize
        total += leaf.size

    logger.info("%-28s %12s %10s", "module", "params", "MB")
    for name in sorted(groups, key=lambda k: -groups[k][0]):
        n, b = groups[name]
        logger.info("%-28s %12d %10.2f", name, n, b / 2 ** 20)
    logger.info("%-28s %12d %10.2f  (%d leaves)", "TOTAL", total,
                sum(b for _, b in groups.values()) / 2 ** 20, len(flat))

    ckpt = (cfg.get("inspect", {}) or {}).get("checkpoint")
    if ckpt:
        from dpde_tpu.training import load_pretrained_params

        params = load_pretrained_params(resolve_data_path(ckpt),
                                        den.params)
        logger.info("\ncheckpoint %s:", ckpt)
        gnorm = float(np.sqrt(sum(
            float((np.asarray(x, np.float64) ** 2).sum())
            for x in jax.tree_util.tree_leaves(params))))
        logger.info("  global L2 norm %.4f", gnorm)
        for kp, leaf in jax.tree_util.tree_flatten_with_path(params)[0][:6]:
            a = np.asarray(leaf)
            logger.info("  %-44s %-14s mean %+0.3e std %0.3e",
                        _keystr(kp), str(a.shape), a.mean(), a.std())
        logger.info("  ... (%d leaves)", len(flat))


if __name__ == "__main__":
    main()
