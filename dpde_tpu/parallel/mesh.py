"""Device mesh + sharding helpers (the framework's distributed backend).

The reference has no distributed layer at all (SURVEY.md section 2.3; its
device handling is a single ``torch.device("cuda:0")``, reference
train.py:38). Here data parallelism is first-class: a 1-D
``Mesh(('data',))`` over the ICI, batches sharded on the leading axis,
parameters replicated. XLA inserts the gradient all-reduce over ICI —
there is no hand-written collective code to maintain.

TP/PP are intentionally not built: the models are <10M params on 64x64
grids, far below one chip's HBM (SURVEY.md section 2.3 directs stating
this rather than silently omitting). The spatial-sharding analogue for
large grids lives in ``parallel.spatial``.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "data") -> Mesh:
    """1-D data-parallel mesh over the first n available devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) axis; everything else replicated."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch: Any, axis: str = "data") -> Any:
    """device_put a pytree of host arrays with the batch axis sharded.

    Batches whose leading dim does not divide the mesh size (e.g. a tiny
    validation split) are replicated instead — correctness first, the
    epoch iterators in data.datasets produce full divisible batches on the
    hot path.
    """
    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    sh = batch_sharding(mesh, axis)
    rep = replicated(mesh)

    def put(x):
        if x is None:
            return None
        target = sh if (hasattr(x, "shape") and x.ndim > 0
                        and x.shape[0] % n_dev == 0) else rep
        return jax.device_put(x, target)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree: Any) -> Any:
    sh = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)
