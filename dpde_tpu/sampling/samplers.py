"""EDM samplers as fully-jitted lax.scan loops.

TPU re-design of the reference samplers (reference:
src/diffusion_pde/sampling/sample.py:145-363). The reference runs a Python
loop with per-step host sync (``losses[i] = ...item()``, sample.py:357) and
takes guidance gradients with torch.autograd through 3-forward finite
differences; here each sampler compiles ONCE into a single XLA program:

  * Heun (2nd order) steps over a host-computed float64 Karras grid
    (device state fp32 — SURVEY.md section 7 numerics note);
  * guidance = jax.grad of a step-local closure that contains the full
    Heun step, so the gradient flows through both denoiser evaluations
    exactly like the reference's autograd through the step
    (sample.py:353-355);
  * the time derivative uses jvp (2 fwd-equivalents vs 3 fwd for FD) and
    is stop-gradient, matching the reference's no_grad FD evaluations;
  * per-step losses are scan outputs — zero host syncs inside the loop.

Throughput: multiple test items can be flattened into one batch (item k =
a contiguous block of ``num_samples`` rows). The reference takes
``sqrt(sum_batch(...))`` over ONE item's sample batch (sample.py:340-347),
so the sqrt here is taken per item group (pde_losses.group_sqrt_sum) and
the per-item combined losses are summed for the gradient — each item's
samples come out bit-identical to a single-item run (tested in
tests/test_samplers.py::test_item_batching_exact).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.deriv import net_and_dnet_dt
from .karras import karras_sigmas
from .pde_losses import group_sqrt_sum


@dataclass
class UnconditionalSampler:
    """Plain EDM Heun sampler (reference UnconditionalSampler,
    sample.py:145-239)."""

    net: Callable
    sample_shape: tuple[int, int]
    num_channels: int
    num_samples: int
    num_steps: int = 18
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    remat: bool = False   # no guidance backward here, so remat only
    # bounds activation memory for very large sample batches; off by
    # default (matches JointSampler's jit/remat surface, VERDICT r2)

    def __post_init__(self):
        self._jit = jax.jit(self._sample,
                            static_argnames=("num_steps", "have_labels",
                                             "have_obs"))

    def sample(self, key, labels=None, net_obs=None, num_steps=None):
        num_steps = num_steps or self.num_steps
        sigmas = jnp.asarray(
            karras_sigmas(num_steps, self.sigma_min, self.sigma_max,
                          self.rho), dtype=jnp.float32)
        # self.net rides along as a jit ARGUMENT (it is a pytree), not a
        # closure: closed-over params become constants baked into the
        # lowered HLO — megabytes of literals fetched leaf-by-leaf at
        # trace time (minutes over a tunneled device link) and a separate
        # compile-cache entry per checkpoint. As an input, the program is
        # weight-independent: one compile serves every checkpoint.
        return self._jit(self.net, key, sigmas, labels, net_obs,
                         num_steps=num_steps,
                         have_labels=labels is not None,
                         have_obs=net_obs is not None)

    def _sample(self, net, key, sigmas, labels, net_obs, *, num_steps,
                have_labels, have_obs):
        b = labels.shape[0] if have_labels else self.num_samples
        h, w = self.sample_shape
        latents = jax.random.normal(key, (b, h, w, self.num_channels))
        x0 = latents * sigmas[0]

        def dx(x, sigma):
            s = jnp.full((b,), sigma, dtype=jnp.float32)
            x_n = net(x, s, labels if have_labels else None,
                      net_obs if have_obs else None)
            return (x - x_n) / sigma

        if self.remat:
            dx = jax.checkpoint(dx)

        # Heun for i = 0..N-2, final Euler step outside the scan (keeps the
        # scanned body branch-free; see JointSampler._sample comment)
        def step(x_cur, inp):
            sigma_cur, sigma_next = inp
            d_cur = dx(x_cur, sigma_cur)
            x_eul = x_cur + (sigma_next - sigma_cur) * d_cur
            d_prime = dx(x_eul, sigma_next)
            x_next = x_cur + (sigma_next - sigma_cur) * 0.5 * (
                d_cur + d_prime)
            return x_next, None

        x, _ = jax.lax.scan(step, x0, (sigmas[:-2], sigmas[1:-1]))
        x = x + (0.0 - sigmas[-2]) * dx(x, sigmas[-2])
        return x


@dataclass
class JointSampler:
    """Guided (DPS-style) sampler for joint models (reference JointSampler,
    sample.py:243-363): per step, observation losses on the denoised
    estimate plus a PDE residual loss, combined with the zeta schedule
    (full weights for the first 80% of steps, obs-weights x0.1 after,
    sample.py:348-351), gradient w.r.t. the step input subtracted from the
    Heun output.

    ``loss_fn(u_N, dudt, labels, **loss_kwargs) -> scalar`` is the PDE
    guidance (sampling.pde_losses). ``out_and_grad_fn(net, x, sigma,
    labels) -> (x_N, dxdt)`` supplies the denoised estimate and its time
    derivative (ops.deriv; default jvp).
    """

    net: Callable
    sample_shape: tuple[int, int]
    num_channels: int
    num_samples: int
    ch_a: int
    loss_fn: Callable
    loss_kwargs: dict
    num_steps: int = 18
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    out_and_grad_fn: Callable = net_and_dnet_dt
    remat: bool = True   # jax.checkpoint the denoiser evals: the guidance
    # backward then recomputes activations instead of keeping both Heun
    # evals' activations live (SURVEY.md section 7 memory note)
    guidance_mode: str = "exact"
    # How the guidance gradient is taken (round-5 perf work — the guided
    # step is compute-bound, so the backward structure is the FLOP lever):
    #   "exact"        grad of the step-local closure w.r.t. the step
    #                  input, flowing through BOTH Heun denoiser evals —
    #                  the reference's autograd-through-the-step semantics
    #                  (sample.py:353-355). ~7.9 fwd-equivalents/step.
    #   "second_eval"  standard DPS shape: grad w.r.t. the corrected
    #                  (second) eval's input only; the first eval is
    #                  treated as a frozen direction. Drops one full
    #                  backward (~5.9 fwd-eq/step). Guidance weights are
    #                  checkpoint-specific anyway (tools/tune_sampler.py),
    #                  so the mode change just shifts the tuned zetas.
    #   "x0"           no backward through the net at all: the cotangent
    #                  of the guidance loss w.r.t. the denoised estimate
    #                  is applied directly (manifold-free approximation).
    #                  Cheapest (~3.9 fwd-eq/step), most approximate.
    #   "x0c"          "x0" with the cotangent scaled by the denoiser's
    #                  dominant Jacobian scalar c_skip(sigma) =
    #                  sd^2/(sigma^2+sd^2): restores the sigma-PROFILE of
    #                  the exact guidance magnitude that plain x0 loses
    #                  (a constant is absorbed by the zetas; the profile
    #                  is not). Same cost as "x0".
    #   "hybrid"       "x0" for the first 80% of steps (where guidance
    #                  only needs to steer coarsely), "second_eval" for
    #                  the precision-critical tail (where the zeta
    #                  schedule also drops obs weights x0.1).
    sigma_data: float = 0.5   # for the "x0c" c_skip profile
    hybrid_split: float = 0.8   # fraction of steps run as "x0" before
    # the "second_eval" tail ("hybrid" mode only); lower = more quality,
    # less speed (x0 ~3 fwd-eq/step, second_eval ~4)

    def __post_init__(self):
        if self.guidance_mode not in ("exact", "second_eval", "x0", "x0c",
                                      "hybrid"):
            raise ValueError(
                f"unknown guidance_mode: {self.guidance_mode!r}")
        self._jit = jax.jit(
            self._sample,
            static_argnames=("num_steps", "have_labels"))

    def sample(self, key, labels, obs_a, obs_u, mask_a, mask_u,
               zeta_a, zeta_u, zeta_pde, return_losses=False,
               num_steps=None, latents=None):
        """obs_a: (B|1, H, W, ch_a); obs_u: (B|1, H, W, C-ch_a);
        masks: (H, W) booleans. B = K * num_samples flattens K items
        (contiguous blocks of num_samples rows); guidance sqrt-sums are
        taken per item, so each item reproduces a standalone run exactly.
        ``latents`` optionally fixes the initial noise (B, H, W, C) —
        used for standalone-vs-batched exactness tests. Returns
        (x, losses) with losses (num_steps, 4) per-item traces when
        K == 1, else (num_steps, K, 4)."""
        num_steps = num_steps or self.num_steps
        sigmas = jnp.asarray(
            karras_sigmas(num_steps, self.sigma_min, self.sigma_max,
                          self.rho), dtype=jnp.float32)
        # net passed as a pytree argument — see UnconditionalSampler.sample
        x, losses = self._jit(
            self.net, key, sigmas,
            labels,
            jnp.asarray(obs_a, jnp.float32),
            jnp.asarray(obs_u, jnp.float32),
            jnp.asarray(mask_a, jnp.float32),
            jnp.asarray(mask_u, jnp.float32),
            jnp.asarray(zeta_a, jnp.float32),
            jnp.asarray(zeta_u, jnp.float32),
            jnp.asarray(zeta_pde, jnp.float32),
            latents,
            num_steps=num_steps,
            have_labels=labels is not None,
        )
        if return_losses:
            losses = np.asarray(losses)
            return x, (losses[:, 0] if losses.shape[1] == 1 else losses)
        return x, None

    def _sample(self, net, key, sigmas, labels, obs_a, obs_u, mask_a,
                mask_u, zeta_a, zeta_u, zeta_pde, latents, *, num_steps,
                have_labels):
        b = labels.shape[0] if have_labels else self.num_samples
        k_items = max(1, b // self.num_samples)   # flattened test items
        h, w = self.sample_shape
        ch_a = self.ch_a
        mask_a3 = mask_a[..., None]       # (H, W, 1) -> broadcast channels
        mask_u3 = mask_u[..., None]
        lbl = labels if have_labels else None

        if latents is None:
            latents = jax.random.normal(key, (b, h, w, self.num_channels))
        x0 = latents * sigmas[0]

        def eval_net(x, sigma):
            s = jnp.full((b,), sigma, dtype=jnp.float32)
            return self.out_and_grad_fn(net, x, s, lbl)

        def eval_plain(x, sigma):
            # first Heun eval: its time derivative is discarded (only the
            # corrected eval's dxdt feeds guidance, as in the reference's
            # use of the second out_and_grad call, sample.py:331-347), so
            # skip the tangent computation entirely (~1 fwd vs ~2.2).
            s = jnp.full((b,), sigma, dtype=jnp.float32)
            return net(x, s, lbl)

        if self.remat:
            eval_net = jax.checkpoint(eval_net)
            eval_plain = jax.checkpoint(eval_plain)

        def guidance(x_nf, dxdtf, i):
            # per-item (K,) sqrt-sums — see module docstring
            loss_u = group_sqrt_sum(
                (mask_u3 * (x_nf[..., ch_a:] - obs_u)) ** 2, k_items)
            loss_a = group_sqrt_sum(
                (mask_a3 * (x_nf[..., :ch_a] - obs_a)) ** 2, k_items)
            loss_pde = self.loss_fn(x_nf[..., ch_a:], dxdtf[..., ch_a:],
                                    lbl, num_items=k_items,
                                    **self.loss_kwargs)
            late = i > 0.8 * num_steps
            w_a = jnp.where(late, 0.1 * zeta_a, zeta_a)
            w_u = jnp.where(late, 0.1 * zeta_u, zeta_u)
            loss_comb = w_a * loss_a + w_u * loss_u + zeta_pde * loss_pde
            # items are independent: summing per-item combined losses gives
            # each item exactly its own gradient
            return loss_comb.sum(), jnp.stack(
                [loss_a, loss_u, loss_pde, loss_comb], axis=-1)   # (K, 4)

        # Heun steps for i = 0..N-2 (sigma_next > 0): no branch in the
        # scanned body — the final Euler step runs once outside the scan,
        # halving the traced/compiled graph vs a lax.cond formulation.
        def step_exact(x_carry, inp):
            i, sigma_cur, sigma_next = inp

            def step_loss(x_cur):
                x_n = eval_plain(x_cur, sigma_cur)
                d_cur = (x_cur - x_n) / sigma_cur
                x_eul = x_cur + (sigma_next - sigma_cur) * d_cur
                x_n2, dxdt2 = eval_net(x_eul, sigma_next)
                d_prime = (x_eul - x_n2) / sigma_next
                x_next = x_cur + (sigma_next - sigma_cur) * 0.5 * (
                    d_cur + d_prime)
                loss_comb, losses = guidance(x_n2, dxdt2, i)
                return loss_comb, (x_next, losses)

            grad_x, (x_next, losses) = jax.grad(
                step_loss, has_aux=True)(x_carry)
            return x_next - grad_x, losses

        def step_second_eval(x_carry, inp):
            # "second_eval" guidance: the first (predictor) eval is a pure
            # forward — no residuals kept, no backward through it
            i, sigma_cur, sigma_next = inp
            x_n = jax.lax.stop_gradient(eval_plain(x_carry, sigma_cur))
            d_cur = (x_carry - x_n) / sigma_cur
            x_eul = x_carry + (sigma_next - sigma_cur) * d_cur

            def corr_loss(xe):
                x_n2, dxdt2 = eval_net(xe, sigma_next)
                d_prime = (xe - x_n2) / sigma_next
                loss_comb, losses = guidance(x_n2, dxdt2, i)
                return loss_comb, (d_prime, losses)

            grad_x, (d_prime, losses) = jax.grad(
                corr_loss, has_aux=True)(x_eul)
            x_next = x_carry + (sigma_next - sigma_cur) * 0.5 * (
                d_cur + d_prime)
            return x_next - grad_x, losses

        def make_step_x0(cskip_profile):
            def step_x0(x_carry, inp):
                # "x0" guidance: cotangent of the loss w.r.t. the denoised
                # estimate applied directly — zero backwards through the
                # net; "x0c" additionally scales it by c_skip(sigma_next)
                i, sigma_cur, sigma_next = inp
                x_n = eval_plain(x_carry, sigma_cur)
                d_cur = (x_carry - x_n) / sigma_cur
                x_eul = x_carry + (sigma_next - sigma_cur) * d_cur
                x_n2, dxdt2 = eval_net(x_eul, sigma_next)
                d_prime = (x_eul - x_n2) / sigma_next
                x_next = x_carry + (sigma_next - sigma_cur) * 0.5 * (
                    d_cur + d_prime)

                def g_loss(xn):
                    loss_comb, losses = guidance(xn, dxdt2, i)
                    return loss_comb, losses

                grad_x, losses = jax.grad(g_loss, has_aux=True)(
                    jax.lax.stop_gradient(x_n2))
                if cskip_profile:
                    sd2 = self.sigma_data ** 2
                    grad_x = grad_x * (sd2 / (sigma_next ** 2 + sd2))
                return x_next - grad_x, losses
            return step_x0

        steps = {"exact": step_exact, "second_eval": step_second_eval,
                 "x0": make_step_x0(False), "x0c": make_step_x0(True)}

        if self.guidance_mode == "hybrid":
            # x0 for the coarse first hybrid_split of steps, second_eval
            # for the precision tail
            split = int(self.hybrid_split * num_steps)
            split = min(max(split, 0), num_steps - 1)
            idx = jnp.arange(num_steps - 1, dtype=jnp.float32)
            xs = (idx, sigmas[:-2], sigmas[1:-1])
            x, losses0 = jax.lax.scan(
                make_step_x0(False), x0,
                jax.tree.map(lambda a: a[:split], xs))
            x, losses1 = jax.lax.scan(
                step_second_eval, x,
                jax.tree.map(lambda a: a[split:], xs))
            losses = jnp.concatenate([losses0, losses1], axis=0)
        else:
            step = steps[self.guidance_mode]
            idx = jnp.arange(num_steps - 1, dtype=jnp.float32)
            x, losses = jax.lax.scan(step, x0,
                                     (idx, sigmas[:-2], sigmas[1:-1]))

        # final Euler step to sigma = 0 (reference loop i = N-1)
        def final_loss(x_cur):
            sigma_cur = sigmas[-2]
            x_n, dxdt = eval_net(x_cur, sigma_cur)
            d_cur = (x_cur - x_n) / sigma_cur
            x_next = x_cur + (0.0 - sigma_cur) * d_cur
            loss_comb, lvec = guidance(x_n, dxdt,
                                       jnp.float32(num_steps - 1))
            return loss_comb, (x_next, lvec)

        grad_x, (x_fin, lvec) = jax.grad(final_loss, has_aux=True)(x)
        x_fin = x_fin - grad_x
        losses = jnp.concatenate([losses, lvec[None]], axis=0)
        return x_fin, losses


@dataclass
class ForwardConditionedSampler:
    """Guided sampler for forward-method models (the working equivalent of
    the reference's dead EDMHeatSampler.sample_forward path,
    sample.py:533-619): x holds only the solution channels, the initial
    condition conditions the network as obs input, and guidance uses the
    obs_u observation + PDE losses."""

    net: Callable
    sample_shape: tuple[int, int]
    num_channels: int
    num_samples: int
    loss_fn: Callable
    loss_kwargs: dict
    num_steps: int = 18
    sigma_min: float = 0.002
    sigma_max: float = 80.0
    rho: float = 7.0
    out_and_grad_fn: Callable = net_and_dnet_dt
    remat: bool = True

    def __post_init__(self):
        self._jit = jax.jit(self._sample,
                            static_argnames=("num_steps", "have_labels"))

    def sample(self, key, labels, obs_u, mask_u, zeta_u, zeta_pde,
               net_obs=None, return_losses=False, num_steps=None,
               latents=None):
        num_steps = num_steps or self.num_steps
        sigmas = jnp.asarray(
            karras_sigmas(num_steps, self.sigma_min, self.sigma_max,
                          self.rho), dtype=jnp.float32)
        # net passed as a pytree argument — see UnconditionalSampler.sample
        x, losses = self._jit(
            self.net, key, sigmas, labels,
            jnp.asarray(obs_u, jnp.float32),
            jnp.asarray(mask_u, jnp.float32),
            net_obs,
            jnp.asarray(zeta_u, jnp.float32),
            jnp.asarray(zeta_pde, jnp.float32),
            latents,
            num_steps=num_steps, have_labels=labels is not None)
        if return_losses:
            losses = np.asarray(losses)
            return x, (losses[:, 0] if losses.shape[1] == 1 else losses)
        return x, None

    def _sample(self, net, key, sigmas, labels, obs_u, mask_u, net_obs,
                zeta_u, zeta_pde, latents, *, num_steps, have_labels):
        b = labels.shape[0] if have_labels else self.num_samples
        k_items = max(1, b // self.num_samples)
        h, w = self.sample_shape
        mask_u3 = mask_u[..., None]
        lbl = labels if have_labels else None

        if latents is None:
            latents = jax.random.normal(key, (b, h, w, self.num_channels))
        x0 = latents * sigmas[0]

        def eval_net(x, sigma):
            s = jnp.full((b,), sigma, dtype=jnp.float32)
            bound = lambda xx, ss, ll: net(xx, ss, ll, net_obs)
            return self.out_and_grad_fn(bound, x, s, lbl)

        def eval_plain(x, sigma):
            s = jnp.full((b,), sigma, dtype=jnp.float32)
            return net(x, s, lbl, net_obs)

        if self.remat:
            eval_net = jax.checkpoint(eval_net)
            eval_plain = jax.checkpoint(eval_plain)

        def guidance(x_nf, dxdtf, i):
            loss_u = group_sqrt_sum((mask_u3 * (x_nf - obs_u)) ** 2,
                                    k_items)
            loss_pde = self.loss_fn(x_nf, dxdtf, lbl, num_items=k_items,
                                    **self.loss_kwargs)
            late = i > 0.8 * num_steps
            w_u = jnp.where(late, 0.1 * zeta_u, zeta_u)
            loss_comb = w_u * loss_u + zeta_pde * loss_pde
            return loss_comb.sum(), jnp.stack(
                [loss_u, loss_pde, loss_comb], axis=-1)   # (K, 3)

        def step(x_carry, inp):
            i, sigma_cur, sigma_next = inp

            def step_loss(x_cur):
                x_n = eval_plain(x_cur, sigma_cur)
                d_cur = (x_cur - x_n) / sigma_cur
                x_eul = x_cur + (sigma_next - sigma_cur) * d_cur
                x_n2, dxdt2 = eval_net(x_eul, sigma_next)
                d_prime = (x_eul - x_n2) / sigma_next
                x_next = x_cur + (sigma_next - sigma_cur) * 0.5 * (
                    d_cur + d_prime)
                loss_comb, losses = guidance(x_n2, dxdt2, i)
                return loss_comb, (x_next, losses)

            grad_x, (x_next, losses) = jax.grad(
                step_loss, has_aux=True)(x_carry)
            return x_next - grad_x, losses

        idx = jnp.arange(num_steps - 1, dtype=jnp.float32)
        x, losses = jax.lax.scan(step, x0,
                                 (idx, sigmas[:-2], sigmas[1:-1]))

        def final_loss(x_cur):
            sigma_cur = sigmas[-2]
            x_n, dxdt = eval_net(x_cur, sigma_cur)
            x_next = x_cur + (0.0 - sigma_cur) * (x_cur - x_n) / sigma_cur
            loss_comb, lvec = guidance(x_n, dxdt,
                                       jnp.float32(num_steps - 1))
            return loss_comb, (x_next, lvec)

        grad_x, (x_fin, lvec) = jax.grad(final_loss, has_aux=True)(x)
        losses = jnp.concatenate([losses, lvec[None]], axis=0)
        return x_fin - grad_x, losses
