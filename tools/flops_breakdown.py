"""Per-piece FLOP breakdown of the guided Heun step (CPU cost analysis).

Round-5 perf diagnosis: BENCH_r01..r04 were flat at ~0.55 items/s and the
roofline (runs_r4/profile_sampler3.log) shows ~46% MFU with byte counts
above HBM peak (i.e. the program is compute-bound, the bytes figure is an
upper bound). To know what to cut, compile each piece of the step on CPU
and read XLA's exact FLOP counts:

  fwd           one denoiser forward (the unit everything is measured in)
  jvp           forward + time-tangent (ops.deriv.net_and_dnet_dt)
  grad_2nd      backward of a scalar loss through ONE forward (w.r.t. x)
  step_exact    the full guided Heun step as JointSampler compiles it
  step_fast     variant: guidance grad only through the SECOND eval
                (d_cur treated as constant — standard DPS shape)
  step_x0       variant: no backward through the net at all (cotangent of
                the loss applied directly to the denoised estimate)

Run: JAX_PLATFORMS=cpu python tools/flops_breakdown.py
"""

from __future__ import annotations

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax
import jax.numpy as jnp

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

from dpde_tpu.models import Denoiser, EDMUNet
from dpde_tpu.ops.deriv import net_and_dnet_dt
from dpde_tpu.sampling.pde_losses import group_sqrt_sum


def flops(fn, *args):
    c = jax.jit(fn).lower(*args).compile()
    ca = c.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return ca["flops"]


def main():
    b, h, w, ch = 128, 64, 64, 2
    dtype = jnp.bfloat16
    net_mod = EDMUNet(img_channels=ch, label_dim=2, dtype=dtype)
    params = jax.jit(net_mod.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, ch), jnp.float32),
        jnp.ones((1,)), jnp.zeros((1, 2)), None)

    def apply_fn(p, xx, ss, ll, oo, train=False, rngs=None):
        return net_mod.apply(p, xx, ss, ll, oo, train=train)

    den = Denoiser(apply_fn, params)

    x = jnp.zeros((b, h, w, ch), jnp.float32)
    sig = jnp.ones((b,), jnp.float32)
    lbl = jnp.ones((b, 2), jnp.float32)
    obs = jnp.zeros((b, h, w, 1), jnp.float32)
    mask = jnp.ones((h, w, 1), jnp.float32)

    f_fwd = flops(lambda n, xx: n(xx, sig, lbl), den, x)
    f_jvp = flops(lambda n, xx: net_and_dnet_dt(n, xx, sig, lbl), den, x)

    def loss_of(x_n):
        la = group_sqrt_sum((mask * (x_n[..., :1] - obs)) ** 2, 4)
        return la.sum()

    f_grad2 = flops(
        lambda n, xx: jax.grad(lambda z: loss_of(n(z, sig, lbl)))(xx),
        den, x)

    sc, sn = jnp.float32(1.0), jnp.float32(0.8)

    def step_exact(n, x_cur):
        def body(xc):
            x_n = n(xc, sig, lbl)
            d_cur = (xc - x_n) / sc
            x_eul = xc + (sn - sc) * d_cur
            x_n2, dxdt2 = net_and_dnet_dt(n, x_eul, sig, lbl)
            d_prime = (x_eul - x_n2) / sn
            x_next = xc + (sn - sc) * 0.5 * (d_cur + d_prime)
            return loss_of(x_n2), x_next
        g, x_next = jax.grad(body, has_aux=True)(x_cur)
        return x_next - g

    def step_fast(n, x_cur):
        x_n = n(x_cur, sig, lbl)
        d_cur = (x_cur - x_n) / sc
        x_eul = x_cur + (sn - sc) * d_cur

        def body(xe):
            x_n2, dxdt2 = net_and_dnet_dt(n, xe, sig, lbl)
            d_prime = (xe - x_n2) / sn
            return loss_of(x_n2), d_prime
        g, d_prime = jax.grad(body, has_aux=True)(x_eul)
        x_next = x_cur + (sn - sc) * 0.5 * (d_cur + d_prime)
        return x_next - g

    def step_x0(n, x_cur):
        x_n = n(x_cur, sig, lbl)
        d_cur = (x_cur - x_n) / sc
        x_eul = x_cur + (sn - sc) * d_cur
        x_n2, dxdt2 = net_and_dnet_dt(n, x_eul, sig, lbl)
        d_prime = (x_eul - x_n2) / sn
        g = jax.grad(loss_of)(x_n2)
        x_next = x_cur + (sn - sc) * 0.5 * (d_cur + d_prime)
        return x_next - g

    f_exact = flops(step_exact, den, x)
    f_fast = flops(step_fast, den, x)
    f_x0 = flops(step_x0, den, x)

    print(f"fwd                 : {f_fwd:.4g}")
    for name, f in [("jvp", f_jvp), ("grad_2nd(one eval)", f_grad2),
                    ("step_exact", f_exact), ("step_fast", f_fast),
                    ("step_x0", f_x0)]:
        print(f"{name:20s}: {f:.4g}  = {f / f_fwd:.2f} fwd-eq")
    print(f"\nprojected speedups vs exact: fast {f_exact / f_fast:.2f}x, "
          f"x0 {f_exact / f_x0:.2f}x")


if __name__ == "__main__":
    main()
