"""Summarise a test_loop validation_data.npz into summary.json
(the r4 hand-rolled accounting, now a tool): per-channel mean relative
error + per-item median/p90, matching eval/test_loop.py's metric
definitions (reference model_testing.py:216-237)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np


def summarize(npz_path: str | Path, extra: dict | None = None) -> dict:
    d = np.load(npz_path)
    mae, rng = d["MAE"], d["denom_range"]          # (N,C,H,W), (N,C)
    rel = mae / rng[:, :, None, None]
    per_item = rel.mean(axis=(2, 3))               # (N, C)
    out = {
        "n_items": int(mae.shape[0]),
        "ch_rel_error": per_item.mean(axis=0).tolist(),
        "per_item_median": np.median(per_item, axis=0).tolist(),
        "per_item_p90": np.percentile(per_item, 90, axis=0).tolist(),
    }
    if extra:
        out.update(extra)
    return out


if __name__ == "__main__":
    path = Path(sys.argv[1])
    extra = json.loads(sys.argv[2]) if len(sys.argv) > 2 else {}
    s = summarize(path, extra)
    out = path.parent / "summary.json"
    out.write_text(json.dumps(s, indent=2))
    print(json.dumps(s, indent=2))
