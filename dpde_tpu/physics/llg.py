"""JAX Landau-Lifshitz-Gilbert solver (MagTense replacement).

The reference generates muMAG standard-problem-4 data by driving the
external Fortran/CUDA MagTense package per trajectory in a multiprocessing
fan-out (reference: src/diffusion_pde/pdes/llg.py:20-193, 195-264). Here the
whole solver is JAX: trajectories for an entire dataset batch integrate
simultaneously on the TPU via ``vmap`` + ``lax.scan``; no processes, no
shard-merge step.

Physics (reference test docstring, tests/test_llg_pde_loss.py:1-19):

    dm/dt = -gamma * (m x H_eff) - alpha * m x (m x H_eff)
    H_eff = H_ext + H_demag + H_exch + H_anis,  H_anis = 0
    H_exch = (2 A0 / (mu0 Ms)) * laplacian(m)   [reflect/Neumann boundary]
    H_demag: Newell-tensor convolution (physics/demag.py)

with MagTense's parameterisation gamma=2.21e5, alpha=4.42e3 (= lambda,
the damping frequency per unit field), A0=1.3e-11 J/m, Ms=8e5 A/m.

Integration: fixed-step RK4 with renormalisation of m after every substep.
The explicit stability limit is set by damping of the highest exchange
mode, dt < ~2.8 / (alpha * H_exch_max); :func:`stable_dt` computes it so
callers pick substeps automatically instead of hand-tuning.

Field layout is channels-last (nx, ny, 3); converters to the reference's
(3, res_x, res_y) HDF5 schema live in the dataset generator.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stencils import laplacian
from .demag import DemagKernel, h_demag

MU0 = 4e-7 * np.pi

# MagTense-default material constants (reference pde_losses.py:186-191)
GAMMA = 2.21e5      # gyromagnetic ratio [m/(A s)]
ALPHA = 4.42e3      # damping frequency per unit field [m/(A s)]
A0 = 1.3e-11        # exchange stiffness [J/m]
MS = 8e5            # saturation magnetization [A/m]

# muMAG std-4 geometry (reference llg.py:104-107): 500x125x3 nm thin film
STD4_RES = (64, 16, 1)
STD4_GRID = (500e-9, 125e-9, 3e-9)


@dataclass(frozen=True)
class LLGParams:
    gamma: float = GAMMA
    alpha: float = ALPHA
    a0: float = A0
    ms: float = MS
    dx: float = STD4_GRID[0] / STD4_RES[0]

    @property
    def exch_coeff(self) -> float:
        return 2.0 * self.a0 / (MU0 * self.ms)


jax.tree_util.register_pytree_node(
    LLGParams,
    lambda p: ((), (p.gamma, p.alpha, p.a0, p.ms, p.dx)),
    lambda aux, _: LLGParams(*aux),
)


def h_exchange(m: jnp.ndarray, params: LLGParams) -> jnp.ndarray:
    """Exchange field (2 A0 / (mu0 Ms)) * lap(m), reflect (free) boundary —
    same stencil the reference validates against (test_llg_pde_loss.py:82-84)."""
    return params.exch_coeff * laplacian(m, params.dx, channels_last=True)


def h_effective(m: jnp.ndarray, h_ext: jnp.ndarray, kernel: DemagKernel,
                params: LLGParams) -> jnp.ndarray:
    """H_eff = H_ext + H_exch + H_demag (H_anis = 0 for std-4).

    m: (..., nx, ny, 3) unit magnetization; h_ext: broadcastable, A/m.
    """
    return h_ext + h_exchange(m, params) + h_demag(m, kernel, params.ms)


def llg_rhs(m: jnp.ndarray, h_eff: jnp.ndarray,
            params: LLGParams) -> jnp.ndarray:
    """-gamma m x H - alpha m x (m x H) (reference pde_losses.py:245-248)."""
    mxh = jnp.cross(m, h_eff)
    return -params.gamma * mxh - params.alpha * jnp.cross(m, mxh)


def stable_dt(params: LLGParams, safety: float = 0.7) -> float:
    """Explicit RK4 step bound from damping of the highest exchange mode.

    H_exch_max = exch_coeff * 8/dx^2 (checkerboard mode on a square-cell
    grid); the damping rate alpha*H must satisfy rate*dt < ~2.79.
    """
    h_max = params.exch_coeff * 8.0 / (params.dx ** 2)
    rate = params.alpha * h_max + params.gamma * h_max
    return safety * 2.79 / rate


def _normalize(m: jnp.ndarray) -> jnp.ndarray:
    return m / jnp.linalg.norm(m, axis=-1, keepdims=True)


def rk4_step(m: jnp.ndarray, h_ext: jnp.ndarray, dt: float,
             kernel: DemagKernel, params: LLGParams) -> jnp.ndarray:
    """One renormalised RK4 step of the LLG equation."""
    f = lambda mm: llg_rhs(mm, h_effective(mm, h_ext, kernel, params), params)
    k1 = f(m)
    k2 = f(_normalize(m + 0.5 * dt * k1))
    k3 = f(_normalize(m + 0.5 * dt * k2))
    k4 = f(_normalize(m + dt * k3))
    return _normalize(m + (dt / 6.0) * (k1 + 2 * k2 + 2 * k3 + k4))


@partial(jax.jit, static_argnames=("n_out", "substeps"))
def integrate(m0: jnp.ndarray, h_ext: jnp.ndarray, dt_out: float,
              n_out: int, substeps: int, kernel: DemagKernel,
              params: LLGParams) -> jnp.ndarray:
    """Integrate n_out output steps of dt_out (each = `substeps` RK4 steps)
    under a constant external field.

    m0: (..., nx, ny, 3); h_ext broadcastable to m0 in A/m.
    Returns (n_out + 1, ..., nx, ny, 3) including the initial state.
    """
    dt = dt_out / substeps

    def outer(m, _):
        def inner(mm, __):
            return rk4_step(mm, h_ext, dt, kernel, params), None

        m, _ = jax.lax.scan(inner, m, None, length=substeps)
        return m, m

    _, ms = jax.lax.scan(outer, m0, None, length=n_out)
    return jnp.concatenate([m0[None], ms], axis=0)


@partial(jax.jit,
         static_argnames=("n_steps", "record_every", "h_ext_schedule"))
def relax(m0: jnp.ndarray, h_ext_schedule, dt: float, n_steps: int,
          kernel: DemagKernel, params: LLGParams,
          record_every: int = 0) -> jnp.ndarray:
    """Relaxation run with a time-dependent external field.

    ``h_ext_schedule(t) -> (3,)`` must be a jax-traceable function of the
    scalar time. Used for the s-state preparation (reference llg.py:20-57:
    relax 100 ns under a field decaying to zero within 1 ns).
    """

    def body(carry, i):
        m, = carry
        t = i.astype(jnp.float32) * dt
        h = h_ext_schedule(t)
        m = rk4_step(m, h, dt, kernel, params)
        return (m,), None

    (m,), _ = jax.lax.scan(body, (m0,), jnp.arange(n_steps))
    return m


def gen_s_state(res=STD4_RES, grid=STD4_GRID, t_relax: float = 100e-9,
                params: LLGParams | None = None,
                kernel: DemagKernel | None = None) -> np.ndarray:
    """Prepare the muMAG std-4 s-state (reference llg.py:20-57; spec:
    https://www.ctcms.nist.gov/~rdm/std4/spec4.html).

    Starts from uniform (1,1,1)/sqrt(3) and relaxes under a saturating
    field along [1,1,1] ramped to zero within 1 ns, then freely for the
    rest of ``t_relax``. Note the reference multiplies its (1,1,1)/mu0
    field by the prefactor ``(1e-9 - t)`` — i.e. 1e-9 of saturation, an
    effectively ZERO field — which leaves the +x/-x choice of the relaxed
    state to numerical noise; the spec's actual protocol (real saturation,
    slow decay) deterministically selects the +x s-state (<mx> ~ 0.97,
    the value every published std-4 solution starts from).
    Returns (nx, ny, 3) float32.
    """
    nx, ny, _ = res
    dx, dy = grid[0] / nx, grid[1] / ny
    params = params or LLGParams(dx=dx)
    kernel = kernel or DemagKernel.build(nx, ny, dx, dy, grid[2])
    dt = stable_dt(params)
    n_steps = int(np.ceil(t_relax / dt))

    def field(t):
        # saturation (|mu0 H| ~ 1.7 T) ramping linearly to zero at 1 ns
        amp = jnp.maximum(1.0 - t / 1e-9, 0.0) / MU0
        return jnp.asarray([amp, amp, amp])

    m0 = jnp.full((nx, ny, 3), 1.0 / np.sqrt(3.0), dtype=jnp.float32)
    m = np.asarray(relax(m0, field, dt, n_steps, kernel, params))
    # The zero-field s-state is chirality-degenerate (y-mirror symmetry of
    # the energy): integrators fall into either well depending on the
    # precession phase at field release. Canonicalise to the muMAG
    # convention (<my> > 0, the state every published std-4 solution and
    # MagTense start from) by applying the exact mirror map
    # (y -> -y, m_y -> -m_y) when needed; validated by the field-1
    # <mx> zero crossing at 0.138 ns vs the published ~0.136 ns
    # (tests/test_std4_golden.py).
    if float(m[..., 1].mean()) < 0.0:
        m = m[:, ::-1, :].copy()
        m[..., 1] *= -1.0
    return m


def gen_sequences(
    m0_state: np.ndarray,          # (nx, ny, 3) s-state
    h_ext_mT: np.ndarray,          # (B, 3) external fields in mT
    res=STD4_RES,
    grid=STD4_GRID,
    t_steps: int = 500,
    t_per_step: float = 4e-12,
    substeps: int | None = None,
    params: LLGParams | None = None,
    kernel: DemagKernel | None = None,
) -> np.ndarray:
    """Batch-integrate std-4 trajectories on device (replaces the
    reference's per-process MagTense loop, llg.py:60-98 + 160-190).

    Fields are given in mT and converted to A/m by h/(1000 mu0), matching
    llg.py:84. Returns (B, t_steps, nx, ny, 3) float32 — the state at the
    *start* of each of the t_steps output intervals, matching the reference
    slice ``seq[:t_steps]`` of a (t_steps+1)-snapshot simulation
    (llg.py:89,188).
    """
    nx, ny, _ = res
    dx, dy = grid[0] / nx, grid[1] / ny
    params = params or LLGParams(dx=dx)
    kernel = kernel or DemagKernel.build(nx, ny, dx, dy, grid[2])
    if substeps is None:
        substeps = max(1, int(np.ceil(t_per_step / stable_dt(params))))

    h_am = jnp.asarray(h_ext_mT, dtype=jnp.float32) / (1000.0 * MU0)  # (B,3)
    h_b = h_am[:, None, None, :]                                      # bcast
    m0 = jnp.broadcast_to(jnp.asarray(m0_state, dtype=jnp.float32),
                          (h_am.shape[0], nx, ny, 3))

    traj = integrate(m0, h_b, t_per_step, t_steps, substeps, kernel, params)
    # (t_steps+1, B, nx, ny, 3) -> drop final, move time behind batch
    return np.asarray(jnp.moveaxis(traj[:-1], 0, 1))


def sample_external_fields(n: int, seed: int = 0,
                           h_norm: tuple[float, float] = (0.0, 50.0),
                           h_angle: tuple[float, float] = (0.0, 360.0),
                           ) -> np.ndarray:
    """Random in-plane fields in mT (reference llg.py:157-166)."""
    rng = np.random.default_rng(seed)
    rnd = rng.random(size=(n, 2))
    d = (h_norm[1] - h_norm[0]) * rnd[:, 0] + h_norm[0]
    theta = np.deg2rad((h_angle[1] - h_angle[0]) * rnd[:, 1] + h_angle[0])
    h = np.zeros((n, 3))
    h[:, 0] = d * np.cos(theta)
    h[:, 1] = d * np.sin(theta)
    return h
