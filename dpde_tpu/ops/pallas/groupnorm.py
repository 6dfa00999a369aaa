"""Pallas TPU kernel: fused GroupNorm + SiLU.

Every ResBlock in the EDMUNet runs GroupNorm -> SiLU twice
(models/unet.py; reference nets.py:153-211). XLA lowers GroupNorm as a
reduce (stats) fusion plus a normalize fusion — the activation is read
from HBM at least twice. This kernel does the whole thing in one VMEM
pass per batch row: load x once, compute per-group mean/variance,
normalize, scale/shift, SiLU, write once.

Differentiation: the op carries a ``jax.custom_jvp`` rule (NOT
custom_vjp) because the samplers push a forward-mode time tangent
through the whole network (ops/deriv.net_and_dnet_dt); custom_vjp
functions are not forward-differentiable. The JVP rule computes the
primal with the kernel and the tangent with standard jnp ops (linear in
the tangents, so jax.grad still works by linearize-then-transpose —
reverse-mode comes for free).

Usage: `EDMUNet(..., use_pallas_gn=True)` routes both ResBlock norms
through this kernel (A/B'd end-to-end in runs_r5; see
benchmarks/results/ and docs/PARITY.md for the measured verdict).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# whole-(H, W, C) blocks stay far below VMEM at the reference sizes
# (64x64x256 bf16 = 2 MiB); bigger shapes fall back to the XLA path
_VMEM_ELEM_LIMIT = 1 << 21


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, out_ref, *, groups: int,
                    eps: float):
    # Mosaic rejects (HW, G, C/G) shape casts; group reductions go
    # through a (C, G) one-hot indicator matmul instead (tiny MXU ops,
    # fully supported layouts).
    x = x_ref[:].astype(jnp.float32)          # (1, H, W, C) block
    _, h, w, c = x.shape
    cg = c // groups
    xm = x.reshape(h * w, c)
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0)
    gr = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    member = (ch // cg == gr).astype(jnp.float32)        # (C, G)
    n = float(h * w * cg)
    s1 = xm.sum(axis=0, keepdims=True)                   # (1, C)
    s2 = (xm * xm).sum(axis=0, keepdims=True)
    g1 = jnp.dot(s1, member, preferred_element_type=jnp.float32)  # (1, G)
    g2 = jnp.dot(s2, member, preferred_element_type=jnp.float32)
    mean_c = jnp.dot(g1 / n, member.T,
                     preferred_element_type=jnp.float32)          # (1, C)
    ex2_c = jnp.dot(g2 / n, member.T,
                    preferred_element_type=jnp.float32)
    rstd_c = jax.lax.rsqrt(ex2_c - mean_c * mean_c + eps)
    u = ((xm - mean_c) * rstd_c * scale_ref[:].astype(jnp.float32)[None]
         + bias_ref[:].astype(jnp.float32)[None])
    y = u * jax.nn.sigmoid(u)
    out_ref[:] = y.reshape(1, h, w, c).astype(out_ref.dtype)


def _gn_silu_pallas(x, scale, bias, groups, eps):
    b, h, w, c = x.shape
    return pl.pallas_call(
        partial(_gn_silu_kernel, groups=groups, eps=eps),
        # Mosaic compiles only on TPU backends; the CPU test mesh runs
        # the kernel in interpret mode (bit-compatible semantics)
        interpret=jax.default_backend() == "cpu",
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((c,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h, w, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
    )(x, scale, bias)


def _gn_silu_xla(x, scale, bias, groups, eps):
    """Reference semantics in plain jnp (stats in f32, like the kernel)."""
    b, h, w, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xhat = ((xf - mean) * jax.lax.rsqrt(var + eps)).reshape(b, h, w, c)
    u = xhat * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return (u * jax.nn.sigmoid(u)).astype(x.dtype)


@partial(jax.custom_jvp, nondiff_argnums=(3, 4))
def groupnorm_silu(x, scale, bias, groups: int = 32, eps: float = 1e-5):
    """Fused GroupNorm(groups) + SiLU over NHWC ``x``; ``scale``/``bias``
    are per-channel (C,). Matches flax ``GroupNorm`` + ``nn.silu`` with
    float32 statistics."""
    b, h, w, c = x.shape
    if h * w * c > _VMEM_ELEM_LIMIT or c % groups:
        return _gn_silu_xla(x, scale, bias, groups, eps)
    return _gn_silu_pallas(x, scale, bias, groups, eps)


@groupnorm_silu.defjvp
def _groupnorm_silu_jvp(groups, eps, primals, tangents):
    x, scale, bias = primals
    dx, dscale, dbias = tangents
    b, h, w, c = x.shape
    cg = c // groups
    xf = x.astype(jnp.float32).reshape(b, h * w, groups, cg)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    rstd = jax.lax.rsqrt(var + eps)
    xhat = (xf - mean) * rstd
    sc = scale.astype(jnp.float32)
    u = xhat.reshape(b, h, w, c) * sc + bias.astype(jnp.float32)
    sig = jax.nn.sigmoid(u)
    y = (u * sig).astype(x.dtype)

    dxf = dx.astype(jnp.float32).reshape(b, h * w, groups, cg)
    dmean = dxf.mean(axis=(1, 3), keepdims=True)
    dvar = 2.0 * ((xf - mean) * dxf).mean(axis=(1, 3), keepdims=True)
    dxhat = (dxf - dmean) * rstd - xhat * (0.5 * dvar * rstd * rstd)
    du = (dxhat.reshape(b, h, w, c) * sc
          + xhat.reshape(b, h, w, c) * dscale.astype(jnp.float32)
          + dbias.astype(jnp.float32))
    dy = (du * (sig * (1.0 + u * (1.0 - sig)))).astype(x.dtype)
    return y, dy
