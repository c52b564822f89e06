"""Device-count invariance: the TPU-native analog of the reference's
thread-count invariance suite (/root/reference/tests/test_nthreads.py) —
the same trajectory must come out of a 1-device and an n-device run.

Functional JAX removes data races structurally; what this protects is the
padding/sharding layout and the collective-reduction path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

import mimi_tpu as mimi
from mimi_tpu.parallel import sharding as sh

import os

DATA = os.path.join(os.path.dirname(__file__), "data")


def _jc_mat():
    mat = mimi.J2()
    mat.density = 1
    mat.viscosity = -1
    mat.melting_temperature = 1500
    mat.initial_temperature = 20
    mat.specific_heat = 450
    mat.heat_fraction = 0.9
    mat.set_young_poisson(2100, 0.3)
    h = mimi.JohnsonCookTemperatureAndRateDependentHardening()
    h.A, h.B, h.n, h.m = 70, 140, 0.2835, 1.3558
    h.eps0_dot = 0.004
    h.reference_temperature = 20
    mat.hardening = h
    return mat


def _neo_mat():
    mat = mimi.CompressibleOgdenNeoHookean()
    mat.density = 1
    mat.viscosity = -1
    mat.set_young_poisson(2100, 0.3)
    return mat


def _run(mat, n_devices, n_steps=3):
    prob = sh.build_problem(
        os.path.join(DATA, "balken.mesh"),
        2,
        1,
        mat,
        [(2, 0), (2, 1)],
        {1: -3.0},
        rho_inf=0.5,
        pad_multiple=n_devices,
    )
    if n_devices > 1:
        mesh = Mesh(np.array(jax.devices()[:n_devices]), ("e",))
        prob = sh.shard_problem(prob, mesh)
    step = (sh.make_step(prob, 0.5, newton_iters=5, solver="dense"))
    carry = sh.initial_carry(prob)
    for _ in range(n_steps):
        carry = step(carry)
    return np.asarray(carry["u"])


@pytest.mark.parametrize("n_devices", [2, 3, 8])
def test_device_count_invariance_j2(n_devices):
    if len(jax.devices()) < n_devices:
        pytest.skip("not enough devices")
    u1 = _run(_jc_mat(), 1)
    un = _run(_jc_mat(), n_devices)
    assert np.allclose(u1, un, atol=1e-12), np.abs(u1 - un).max()


def test_device_count_invariance_neohook():
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    u1 = _run(_neo_mat(), 1)
    u8 = _run(_neo_mat(), 8)
    assert np.allclose(u1, u8, atol=1e-12)


def test_compiled_vs_interactive_consistency():
    """The compiled fixed-trip-Newton step must land close to the
    interactive (reference-semantics) solver on the same problem."""
    nl = mimi.NonlinearSolid()
    nl.read_mesh(os.path.join(DATA, "balken.mesh"))
    nl.elevate_degrees(2)
    nl.subdivide(1)
    mat = _neo_mat()
    nl.set_material(mat)
    rc = mimi.RuntimeCommunication()
    rc.set_real("ode_coefficient", 0.5)
    nl.runtime_communication = rc
    bc = mimi.BoundaryConditions()
    bc.initial.dirichlet(2, 0).dirichlet(2, 1)
    bc.initial.body_force(1, -3)
    nl.boundary_condition = bc
    nl.setup(1)
    nl.time_step_size = 0.5
    for _ in range(3):
        nl.step_time2()
    u_interactive = np.asarray(nl._system.u)

    u_compiled = _run(_neo_mat(), 1)
    assert np.allclose(u_interactive, u_compiled, atol=1e-6), (
        np.abs(u_interactive - u_compiled).max()
    )
