"""AOT HBM-footprint probe for the whole-epoch-on-device train program.

Lowers and compiles the device-pipeline epoch function (one jitted
``lax.scan`` over all batches, data/device_pipeline.py) WITHOUT running
it, and prints XLA's memory analysis — argument, output, and HLO-temp
sizes. This is how the flat tile-aligned dataset layout was chosen: the
natural (N, T, H, W, C=1) layout made XLA materialise a 2x-padded copy of
the whole dataset as an HLO temp (8.93 GB for the 4.46 GB heat set, OOMing
a 16 GB chip); flat (N*T, H*W*C) rows are lane-aligned and compile to
4.44 GB of temps.

Usage:
    python benchmarks/mem_probe.py            # remat off (default config)
    REMAT=1 python benchmarks/mem_probe.py    # per-ResBlock remat variant
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from dpde_tpu.utils.jaxcache import enable_compilation_cache

enable_compilation_cache()

from dpde_tpu.data import device_pipeline as dp
from dpde_tpu.models import Denoiser, EDMLoss, EDMUNet
from dpde_tpu.models.ema import EMAConfig
from dpde_tpu.training.state import (
    TrainState,
    make_optimizer,
    make_train_step,
)


def main(n=4500, t=65, h=64, w=64, c=1, batch=64):
    net = EDMUNet(img_channels=2, label_dim=2,
                  remat=bool(int(os.environ.get("REMAT", "0"))))
    x0 = jnp.zeros((1, h, w, 2), jnp.float32)
    params = jax.jit(net.init, backend="cpu")(
        jax.random.PRNGKey(0), x0, jnp.ones((1,)), jnp.zeros((1, 2)), None)
    n_par = sum(x.size for x in jax.tree_util.tree_leaves(params))
    print(f"params: {n_par / 1e6:.3f} M  remat={net.remat}")

    def apply_fn(p, xx, ss, ll, oo, train=False, rngs=None):
        return net.apply(p, xx, ss, ll, oo, train=train, rngs=rngs)

    den = Denoiser(apply_fn, params)
    tx = make_optimizer(1e-4, 0.0, 1.0)
    raw = make_train_step(den, EDMLoss(), tx, EMAConfig(0.999, 20, 1),
                          jit=False)
    epoch = dp.make_epoch_fn(raw, dp.make_batch_fn("joint", False), n, batch)

    dd = dp.DeviceData(
        jax.ShapeDtypeStruct((n * t, h * w * c), jnp.float32),
        jax.ShapeDtypeStruct((t,), jnp.float32),
        jax.ShapeDtypeStruct((n, 1), jnp.float32),
        (n, t, h, w, c))
    state_sh = jax.eval_shape(
        lambda p: TrainState(p, tx.init(p), p, jnp.zeros((), jnp.int32)),
        params)
    key = jax.ShapeDtypeStruct((2,), jnp.uint32)
    compiled = epoch.lower(state_sh, key, dd).compile()
    ma = compiled.memory_analysis()
    print(ma)
    gb = 2.0 ** 30
    print(f"args {ma.argument_size_in_bytes / gb:.2f}G + "
          f"temp {ma.temp_size_in_bytes / gb:.2f}G + "
          f"out {ma.output_size_in_bytes / gb:.2f}G")


if __name__ == "__main__":
    main()
