"""Roofline / MFU accounting for the headline guided sampler.

VERDICT r2 item 5: with single-chip throughput pinned at ~0.56 items/s
for two rounds, commit evidence of *where* the time goes. This tool asks
XLA itself: it lowers the bench-identical 50-step JointSampler program,
reads the compiled module's cost analysis (FLOPs + HBM bytes accessed),
times warm executions, and reports achieved FLOP/s and bytes/s against
the v5e single-chip peaks — i.e. whether the program is MXU-bound,
HBM-bound, or leaving performance on the table.

    python tools/profile_sampler.py                 # bench config
    ITEMS_PER_BATCH=8 python tools/profile_sampler.py
    PROFILE_TRACE=logs/profile python tools/profile_sampler.py  # + xprof

Writes benchmarks/results/profile_sampler.json.

Reference hot loop for scale (reference src/diffusion_pde/sampling/
sample.py:318-363): 50 steps x (6 UNet forwards + 1 backward through
all of them) per item-batch.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from dpde_tpu.utils.jaxcache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# TPU v5e (v5 lite) single-chip peaks, from the public spec:
# 197 TFLOP/s bf16 (MXU), ~0.82 TB/s HBM bandwidth.
V5E_PEAK_BF16_FLOPS = 197e12
V5E_PEAK_HBM_BYTES_S = 0.82e12


def main():
    from bench import CKPT, _build_denoiser

    from dpde_tpu.sampling import JointSampler, pde_losses

    h = w = 64
    num_samples = 32
    items_per_batch = int(os.environ.get("ITEMS_PER_BATCH", "4"))
    num_steps = int(os.environ.get("NUM_STEPS", "50"))
    b = num_samples * items_per_batch

    den = _build_denoiser(jax, jnp)
    if CKPT.exists():
        from dpde_tpu.training import load_pretrained_params

        den = den.replace_params(load_pretrained_params(CKPT, den.params))

    rng = np.random.default_rng(0)
    obs_a = rng.standard_normal((b, h, w, 1)).astype(np.float32) * 0.3
    obs_u = rng.standard_normal((b, h, w, 1)).astype(np.float32) * 0.3
    mask = np.zeros((h, w), bool)
    mask[1:-1, 1:-1] = rng.random((h - 2, w - 2)) < 0.2
    mask[[0, -1], :] = mask[:, [0, -1]] = True
    labels = jnp.asarray(
        np.concatenate([rng.uniform(0.1, 0.5, (b, 1)),
                        rng.uniform(0.1, 1.5, (b, 1))], axis=1),
        jnp.float32)

    gmode = os.environ.get("GUIDANCE_MODE", "exact")
    sampler = JointSampler(
        den, (h, w), 2, num_samples, ch_a=1,
        loss_fn=pde_losses.heat_loss2,
        loss_kwargs={"dx": 1.0 / (w - 1)}, num_steps=num_steps,
        remat=False, guidance_mode=gmode)

    from dpde_tpu.sampling.karras import karras_sigmas

    sigmas = jnp.asarray(
        karras_sigmas(num_steps, sampler.sigma_min, sampler.sigma_max,
                      sampler.rho), jnp.float32)
    args = (jax.random.PRNGKey(1), sigmas, labels,
            jnp.asarray(obs_a), jnp.asarray(obs_u),
            jnp.asarray(mask, jnp.float32), jnp.asarray(mask, jnp.float32),
            jnp.float32(20.0), jnp.float32(0.5), jnp.float32(20.0), None)

    # split trace/lower (python) from XLA compile (backend) — the r1/r2
    # 18-minute cold starts need attribution before they can be fixed
    t0 = time.perf_counter()
    lowered = sampler._jit.lower(sampler.net, *args, num_steps=num_steps,
                                 have_labels=True)
    lower_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    compiled = lowered.compile()
    backend_compile_s = time.perf_counter() - t0
    compile_s = lower_s + backend_compile_s
    print(f"trace+lower: {lower_s:.1f}s, XLA compile: "
          f"{backend_compile_s:.1f}s", file=sys.stderr)

    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    # XLA's cost analysis counts a while/scan BODY ONCE, not x trip
    # count (verified r4: a standalone batched denoiser forward costs
    # 1.64 TFLOP at b=128, so the 50-step guided call is ~7 fwd-equiv x
    # 50 steps ~ 575 TFLOP, while compiled.cost_analysis() reports 13.1
    # TFLOP ~ one step's worth). Scale by the step count; the final
    # Euler step outside the scan keeps this a slight UNDER-estimate.
    flops = float(ca.get("flops", float("nan"))) * num_steps
    bytes_acc = float(ca.get("bytes accessed", float("nan"))) * num_steps
    # bytes-accessed x trip-count exceeds physically possible HBM traffic
    # (fusion/reuse make the metric an upper bound) — report it but key
    # the roofline off FLOPs

    trace_dir = os.environ.get("PROFILE_TRACE")
    reps = int(os.environ.get("REPS", "3"))

    # force completion via a tiny device->host fetch: on the tunneled
    # axon platform block_until_ready on AOT-compiled outputs returns
    # immediately (r4: it timed DISPATCH, 0.3 ms "per call"), so a
    # readback of one output row is the only reliable fence
    fence = lambda o: np.asarray(o[0][0, 0, 0, :])

    out = compiled(sampler.net, *args)
    fence(out)                          # warmup exec

    if trace_dir:
        jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = compiled(sampler.net, *args)
        fence(out)
    wall = (time.perf_counter() - t0) / reps
    if trace_dir:
        jax.profiler.stop_trace()
        print(f"trace written to {trace_dir}", file=sys.stderr)

    achieved_flops = flops / wall
    achieved_bw = bytes_acc / wall
    report = {
        "config": {"num_steps": num_steps, "num_samples": num_samples,
                   "items_per_batch": items_per_batch, "batch_rows": b,
                   "remat": False, "guidance_mode": gmode, "device": str(jax.devices()[0])},
        "compile_s": round(compile_s, 1),
        "trace_lower_s": round(lower_s, 1),
        "xla_backend_compile_s": round(backend_compile_s, 1),
        "wall_s_per_call": round(wall, 4),
        "items_per_s": round(items_per_batch / wall, 4),
        "xla_flops_per_call": flops,
        # cost-analysis bytes x trip count exceed physically possible HBM
        # traffic (fusion/reuse make it an upper bound): labelled as such
        # and the bandwidth figure is therefore also an upper bound — the
        # roofline verdict keys off FLOPs/MFU
        "xla_bytes_accessed_per_call_upper_bound": bytes_acc,
        "achieved_tflops_s": round(achieved_flops / 1e12, 2),
        "mfu_vs_v5e_bf16_peak": round(
            achieved_flops / V5E_PEAK_BF16_FLOPS, 4),
        "achieved_hbm_tb_s_upper_bound": round(achieved_bw / 1e12, 3),
        "arithmetic_intensity_flops_per_byte_lower_bound": round(
            flops / bytes_acc, 2) if bytes_acc else None,
        "v5e_ridge_flops_per_byte": round(
            V5E_PEAK_BF16_FLOPS / V5E_PEAK_HBM_BYTES_S, 1),
    }
    out_dir = Path(__file__).resolve().parents[1] / "benchmarks" / "results"
    out_dir.mkdir(parents=True, exist_ok=True)
    path = out_dir / "profile_sampler.json"
    path.write_text(json.dumps(report, indent=2))
    print(json.dumps(report, indent=2))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
