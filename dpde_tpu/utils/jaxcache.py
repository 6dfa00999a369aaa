"""Persistent XLA compilation cache.

The guided samplers compile large scan programs (minutes on first build);
enabling the JAX persistent cache makes every subsequent process start
warm. Called by the entry points and bench before first compile.
"""

from __future__ import annotations

import os
from pathlib import Path


def select_platform() -> None:
    """Honour ``DPDE_PLATFORM`` (e.g. ``cpu``) via ``jax.config``.

    Some environments pre-import jax through sitecustomize and force the
    platform list programmatically, which silently overrides the
    ``JAX_PLATFORMS`` env var — datagen/test runs that must stay off the
    accelerator need the config-level override. No-op when the variable
    is unset.
    """
    plat = os.environ.get("DPDE_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)


def apply_compile_effort() -> None:
    """Optional XLA compile-effort overrides from the environment.

    The guided-sampler programs take many minutes to build at XLA's
    default effort (BENCH_r01/r02 paid ~18 min per shape). These knobs
    trade compile time against (possibly) runtime:

      DPDE_OPT_LEVEL    = O0|O1|O2|O3   -> jax_optimization_level
      DPDE_EXEC_EFFORT  = float in [-1, 1] -> jax_exec_time_optimization_effort

    Unset = XLA defaults. NOTE: these feed the compilation-cache key, so
    benchmark runs must use the same values that warmed the cache.
    """
    import jax

    lvl = os.environ.get("DPDE_OPT_LEVEL")
    if lvl:
        jax.config.update("jax_optimization_level", lvl)
    eff = os.environ.get("DPDE_EXEC_EFFORT")
    if eff:
        jax.config.update("jax_exec_time_optimization_effort", float(eff))


def enable_compilation_cache(cache_dir: str | Path | None = None) -> None:
    import jax

    select_platform()
    apply_compile_effort()
    if cache_dir is None:
        cache_dir = os.environ.get(
            "DPDE_TPU_JAX_CACHE",
            str(Path(__file__).resolve().parents[2] / ".jax_cache"),
        )
    Path(cache_dir).mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
