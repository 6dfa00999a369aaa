"""Network output + time-derivative helpers.

The reference computes D(x) and dD/dt (t = labels[:, 0]) three ways:
central finite differences with 3 UNet forwards (reference: sample.py:21-66),
torch.func.jvp (sample.py:69-103), and a zero-derivative dummy for no-time
models (sample.py:15-18). In JAX the jvp formulation is the natural one —
one jvp costs ~2 forward-equivalents vs 3 forwards for FD — so jvp is the
default and FD is kept for numerical-parity testing (the reference's own
equivalence check: notebooks/00_testing.ipynb cells 19-20, X atol 1e-5,
dX/dt atol 1e-3).

All helpers share the signature ``fn(net, x, sigma, labels) -> (X, dXdt)``
where ``net`` is a callable ``net(x, sigma, labels)``. ``dXdt`` is returned
with a stop_gradient applied, matching the reference sampler semantics where
the FD passes run under no_grad (sample.py:54-58) so guidance gradients do
not flow through the time derivative.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def net_and_dnet_dt_dummy(net, x, sigma, labels):
    """No-time variant: dX/dt = 0 (reference sample.py:15-18)."""
    out = net(x, sigma, labels)
    return out, jnp.zeros_like(out)


def net_and_dnet_dt(net, x, sigma, labels):
    """Exact dX/dt via jvp w.r.t. the time entry labels[:, 0]
    (reference sample.py:69-103)."""
    if labels is None:
        return net_and_dnet_dt_dummy(net, x, sigma, labels)
    t0 = labels[:, 0]

    def f(t):
        lbl = labels.at[:, 0].set(t)
        return net(x, sigma, lbl)

    out, dout = jax.jvp(f, (t0,), (jnp.ones_like(t0),))
    return out, jax.lax.stop_gradient(dout)


def net_and_dnet_dt_fd(net, x, sigma, labels, eps: float = 1e-5):
    """Central-difference dX/dt, 3 forwards (reference sample.py:21-66).

    Kept for parity testing against :func:`net_and_dnet_dt`; the FD passes
    are stop-gradient just like the reference's no_grad context.
    """
    if labels is None:
        return net_and_dnet_dt_dummy(net, x, sigma, labels)
    lbl_p = labels.at[:, 0].add(eps)
    lbl_m = labels.at[:, 0].add(-eps)
    up = jax.lax.stop_gradient(net(x, sigma, lbl_p))
    um = jax.lax.stop_gradient(net(x, sigma, lbl_m))
    dudt = (up - um) / (2.0 * eps)
    u0 = net(x, sigma, labels)
    return u0, dudt
