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


def _jc_mat(cls=None):
    mat = (cls or mimi.J2)()
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


@pytest.mark.parametrize(
    "n_devices",
    [2,
     pytest.param(3, marks=pytest.mark.slow),
     pytest.param(8, marks=pytest.mark.slow)],
)
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


@pytest.mark.parametrize(
    "cls_name",
    [pytest.param("J2Simo", marks=pytest.mark.slow),
     pytest.param("J2Log", marks=pytest.mark.slow)],
)
def test_device_count_invariance_finite_strain_plasticity(cls_name):
    """Completes the reference invariance-suite port over the finite-
    strain plasticity models (/root/reference/tests/test_nthreads.py:
    113-122's j2_simo/j2_log cases, device-count analog)."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    cls = getattr(mimi, cls_name)
    u1 = _run(_jc_mat(cls), 1)
    u8 = _run(_jc_mat(cls), 8)
    assert np.allclose(u1, u8, atol=1e-12), np.abs(u1 - u8).max()


@pytest.mark.parametrize(
    "cls_name", [pytest.param("J2", marks=pytest.mark.slow), "J2Log"]
)
def test_compiled_vs_interactive_plasticity(cls_name):
    """Compiled-core vs interactive-session consistency over materials
    WITH state accumulation (5 steps, so PostTimeAdvance drift in either
    of the duplicated operator implementations would compound and
    surface; reference semantics nonlinear_solid.cpp:285-292)."""
    cls = getattr(mimi, cls_name)
    nl = _interactive(
        "balken.mesh", 2, 1, _jc_mat(cls),
        lambda bc: bc.initial.dirichlet(2, 0).dirichlet(2, 1)
        .body_force(1, -3.0),
        n_steps=5, dt=0.5,
    )
    u_i = np.asarray(nl._system.u)
    u_c = _run(_jc_mat(cls), 1, n_steps=5)
    assert abs(u_c).max() > 1e-3
    assert np.allclose(u_i, u_c, atol=1e-8), np.abs(u_i - u_c).max()


@pytest.mark.slow
def test_compiled_j2log_soa_matches_dense():
    """J2Log's round-3 SoA fast path (Denman-Beavers/Gregory Hencky
    strain, materials/logm.py) against the eigh-based xla engine
    through full compiled steps including state accumulation."""
    def run(residual_impl, solver):
        prob = sh.build_problem(
            os.path.join(DATA, "balken.mesh"), 2, 1, _jc_mat(mimi.J2Log),
            [(2, 0), (2, 1)], {1: -3.0}, rho_inf=0.5,
        )
        step = sh.make_step(
            prob, 0.5, newton_iters=5, solver=solver,
            residual_impl=residual_impl,
        )
        carry = sh.initial_carry(prob)
        for _ in range(5):
            carry = step(carry)
        return np.asarray(carry["u"])

    u_x = run("xla", "dense")
    u_s = run("soa", "iterative")
    assert abs(u_x).max() > 1e-3
    # dense-LU vs FDM-GMRES solver-path difference dominates; the
    # Hencky-strain formulations agree far tighter (see
    # tests/test_materials or the 1e-12 pk1 parity probe)
    assert np.allclose(u_x, u_s, atol=1e-7), np.abs(u_x - u_s).max()


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


# ---------------------------------------------------------------------
# round 2: full-operator compiled core (viscosity / traction / dynamic
# dirichlet / contact) vs the interactive reference-semantics session,
# and while_loop-Newton stopping behavior
# ---------------------------------------------------------------------


def _interactive(mesh, elevate, subdivide, mat, bc_fn, n_steps, dt,
                 rho_inf=0.5):
    nl = mimi.NonlinearSolid()
    nl.read_mesh(os.path.join(DATA, mesh))
    nl.elevate_degrees(elevate)
    nl.subdivide(subdivide)
    nl.set_material(mat)
    rc = mimi.RuntimeCommunication()
    rc.set_real("ode_coefficient", rho_inf)
    nl.runtime_communication = rc
    bc = mimi.BoundaryConditions()
    bc_fn(bc)
    nl.boundary_condition = bc
    nl.setup(1)
    nl.configure_newton("nonlinear_solid", 1e-8, 1e-12, 20, False)
    nl.time_step_size = dt
    for _ in range(n_steps):
        nl.step_time2()
    return nl


def test_compiled_viscosity_vs_interactive():
    """S (v + fac1 a) in the compiled step (reference operator
    nonlinear_solid.cpp:172-205) must match the interactive session."""
    def mk():
        m = _neo_mat()
        m.viscosity = 50.0
        return m

    nl = _interactive(
        "balken.mesh", 2, 1, mk(),
        lambda bc: bc.initial.dirichlet(2, 0).dirichlet(2, 1)
        .body_force(1, -3),
        3, 0.5,
    )
    u_i = np.asarray(nl._system.u)

    prob = sh.build_problem(
        os.path.join(DATA, "balken.mesh"), 2, 1, mk(),
        [(2, 0), (2, 1)], {1: -3.0}, rho_inf=0.5,
    )
    step = sh.make_step(prob, 0.5, newton_iters=20, solver="dense")
    carry = sh.initial_carry(prob)
    for _ in range(3):
        carry = step(carry)
    assert np.allclose(u_i, np.asarray(carry["u"]), atol=1e-8), (
        np.abs(u_i - np.asarray(carry["u"])).max()
    )


def test_compiled_traction_vs_interactive():
    nl = _interactive(
        "balken.mesh", 2, 1, _neo_mat(),
        lambda bc: bc.initial.dirichlet(2, 0).dirichlet(2, 1)
        .traction(3, 1, -4.0),
        3, 0.5,
    )
    u_i = np.asarray(nl._system.u)

    prob = sh.build_problem(
        os.path.join(DATA, "balken.mesh"), 2, 1, _neo_mat(),
        [(2, 0), (2, 1)], {}, rho_inf=0.5,
        traction={3: {1: -4.0}},
    )
    step = sh.make_step(prob, 0.5, newton_iters=20, solver="dense")
    carry = sh.initial_carry(prob)
    for _ in range(3):
        carry = step(carry)
    assert np.allclose(u_i, np.asarray(carry["u"]), atol=1e-8), (
        np.abs(u_i - np.asarray(carry["u"])).max()
    )


def test_compiled_constant_velocity_vs_interactive():
    """Dynamic Dirichlet rows (boundary_conditions.cpp:204-291) in the
    compiled step."""
    nl = _interactive(
        "balken.mesh", 2, 1, _neo_mat(),
        lambda bc: bc.initial.dirichlet(2, 0).dirichlet(2, 1)
        .constant_velocity(3, 1, 0.05),
        4, 0.25,
    )
    u_i = np.asarray(nl._system.u)

    prob = sh.build_problem(
        os.path.join(DATA, "balken.mesh"), 2, 1, _neo_mat(),
        [(2, 0), (2, 1)], {}, rho_inf=0.5,
        constant_velocity={3: {1: 0.05}},
    )
    step = sh.make_step(prob, 0.25, newton_iters=20, solver="dense")
    carry = sh.initial_carry(prob)
    for _ in range(4):
        carry = step(carry)
    u_c = np.asarray(carry["u"])
    # moving rows actually moved
    assert abs(u_c[:, 1]).max() > 0.04
    assert np.allclose(u_i, u_c, atol=1e-8), np.abs(u_i - u_c).max()


def test_compiled_periodic_vs_interactive():
    """Periodic dof identification in the compiled core
    (NURBSExtension::ConnectBoundaries semantics,
    py_nonlinear_solid.cpp:34-75): assembly on the reduced dof set must
    reproduce the interactive session's trajectory, and the connected
    edges must carry identical displacements."""
    nl = _interactive(
        "balken.mesh", 1, 1, _neo_mat(),
        lambda bc: bc.initial.dirichlet(0, 0).dirichlet(0, 1)
        .body_force(1, -5).periodic(3, 4),
        3, 0.05,
    )
    u_i = np.asarray(nl._system.u)

    prob = sh.build_problem(
        os.path.join(DATA, "balken.mesh"), 1, 1, _neo_mat(),
        [(0, 0), (0, 1)], {1: -5.0}, rho_inf=0.5,
        periodic={2: 3},
    )
    assert prob.n_dof == nl._system.n_dof
    step = sh.make_step(prob, 0.05, newton_iters=20, solver="dense")
    carry = sh.initial_carry(prob)
    for _ in range(3):
        carry = step(carry)
    u_c = np.asarray(carry["u"])
    assert abs(u_c[:, 1]).max() > 1e-6  # it moved
    assert np.allclose(u_i, u_c, atol=1e-8), np.abs(u_i - u_c).max()
    # connected edges share dofs in the full-space view
    fes = nl._system.fes
    u_full = u_c[nl._system.red_index]
    assert np.allclose(
        u_full[fes.side_dofs(2)], u_full[fes.side_dofs(3)]
    )


@pytest.mark.slow
def test_compiled_periodic_iterative_matches_dense():
    """The conn-based gather/scatter iterative path (grid/FDM are
    disabled under periodic) agrees with the dense solve."""
    def build():
        return sh.build_problem(
            os.path.join(DATA, "balken.mesh"), 1, 1, _neo_mat(),
            [(0, 0), (0, 1)], {1: -5.0}, rho_inf=0.5,
            periodic={2: 3}, dtype=jnp.float64,
        )

    prob_d = build()
    assert prob_d.fdm is None and prob_d.grid is None
    step_d = sh.make_step(prob_d, 0.05, newton_iters=20, solver="dense")
    carry_d = sh.initial_carry(prob_d)
    prob_i = build()
    step_i = sh.make_step(
        prob_i, 0.05, newton_iters=20, solver="cg", cg_iters=200
    )
    carry_i = sh.initial_carry(prob_i)
    for _ in range(2):
        carry_d = step_d(carry_d)
        carry_i = step_i(carry_i)
    assert np.allclose(
        np.asarray(carry_d["u"]), np.asarray(carry_i["u"]), atol=1e-8
    ), np.abs(np.asarray(carry_d["u"]) - np.asarray(carry_i["u"])).max()


def _press_problem(pad_multiple=1):
    from mimi_tpu.splines import Bezier

    mat = mimi.CompressibleOgdenNeoHookean()
    mat.density = 1e3
    mat.viscosity = 100.0
    mat.set_young_poisson(1e6, 0.3)
    tool = Bezier([1], [[-1.885, 2.464], [1.903, 0.570]])
    scene = mimi.NearestDistanceToSplines()
    scene.add_spline(tool)
    scene.plant_kd_tree(2000, 1)
    scene.coefficient = 5e7
    prob = sh.build_problem(
        os.path.join(DATA, "square-nurbs.mesh"), 1, 2, mat,
        [(0, 0), (0, 1)], {}, rho_inf=0.5,
        contact=[(1, scene)], pad_multiple=pad_multiple,
    )
    return prob, scene, tool


def _run_press_compiled(n_devices, n_steps=4, solver="dense",
                        newton_iters=60, **step_kw):
    prob, scene, tool = _press_problem(pad_multiple=n_devices)
    if n_devices > 1:
        mesh = Mesh(np.array(jax.devices()[:n_devices]), ("e",))
        prob = sh.shard_problem(prob, mesh)
    step = sh.make_step(prob, 0.01, newton_iters=newton_iters,
                        solver=solver, rel_tol=1e-10, abs_tol=1e-8,
                        **step_kw)
    carry = sh.initial_carry(prob)
    push = 0.005 * np.array([1.0, 2.0]) / np.sqrt(5.0)
    for _ in range(n_steps):
        tool.cps[:] -= push
        scene.plant_kd_tree(2000, 1)
        carry = step(carry, contact_scenes=[scene.scene_data()])
    return carry


@pytest.mark.slow
def test_compiled_contact_vs_interactive():
    """The compiled step's two-pass mortar contact (+ viscosity) must
    reproduce the interactive nl_contact-style press trajectory."""
    from mimi_tpu.splines import Bezier

    # interactive run (test_contact._press_setup config)
    nl = mimi.NonlinearSolid()
    nl.read_mesh(os.path.join(DATA, "square-nurbs.mesh"))
    nl.elevate_degrees(1)
    nl.subdivide(2)
    mat = mimi.CompressibleOgdenNeoHookean()
    mat.density = 1e3
    mat.viscosity = 100.0
    mat.set_young_poisson(1e6, 0.3)
    nl.set_material(mat)
    tool = Bezier([1], [[-1.885, 2.464], [1.903, 0.570]])
    scene = mimi.NearestDistanceToSplines()
    scene.add_spline(tool)
    scene.plant_kd_tree(2000, 1)
    scene.coefficient = 5e7
    rc = mimi.RuntimeCommunication()
    rc.set_real("ode_coefficient", 0.5)
    nl.runtime_communication = rc
    bc = mimi.BoundaryConditions()
    bc.initial.dirichlet(0, 0).dirichlet(0, 1)
    bc.current.contact(1, scene)
    nl.boundary_condition = bc
    nl.setup(1)
    nl.configure_newton("nonlinear_solid", 1e-10, 1e-8, 60, False)
    nl.time_step_size = 0.01
    push = 0.005 * np.array([1.0, 2.0]) / np.sqrt(5.0)
    for _ in range(4):
        tool.cps[:] -= push
        scene.plant_kd_tree(2000, 1)
        nl.step_time2()
    u_i = np.asarray(nl._system.u)

    carry = _run_press_compiled(1)
    u_c = np.asarray(carry["u"])
    assert abs(u_c).max() > 1e-4  # contact actually engaged
    assert np.allclose(u_i, u_c, atol=1e-6), np.abs(u_i - u_c).max()
    # observability: compiled contact force points along inward normal
    force = np.asarray(carry["contact"][0]["force"])
    assert force[0] < 0 and force[1] < 0


@pytest.mark.slow
def test_compiled_contact_device_invariance():
    """4 steps so the tool (0.02 offset, 0.005/step) is truly engaged —
    the sharded contact scatter path must agree with single-device.

    Newton must actually CONVERGE here (newton_iters=150; the
    frozen-pressure tangent converges linearly, ~96 iterations on the
    engagement step): an unconverged best-iterate return amplifies the
    psum-ordering ulps between the 1- and 8-device programs chaotically
    (round-3 finding — the round-2 1e-10 pass relied on bitwise
    determinism, not on convergence)."""
    if len(jax.devices()) < 8:
        pytest.skip("not enough devices")
    c1 = _run_press_compiled(1, n_steps=4, newton_iters=150)
    c8 = _run_press_compiled(8, n_steps=4, newton_iters=150)
    assert bool(c1["newton"]["converged"]) and bool(
        c8["newton"]["converged"]
    )
    u1, u8 = np.asarray(c1["u"]), np.asarray(c8["u"])
    assert abs(u1).max() > 1e-3  # engaged
    assert np.allclose(u1, u8, atol=1e-9), np.abs(u1 - u8).max()


@pytest.mark.slow
def test_compiled_contact_iterative_matches_dense():
    """Block-Jacobi GMRES must handle the contact-stiff tangent
    (VERDICT round-1 item 7): same trajectory as the dense LU path.
    Converged-Newton configuration (see the device-invariance note)."""
    ud = np.asarray(
        _run_press_compiled(
            1, n_steps=4, solver="dense", newton_iters=150
        )["u"]
    )
    ug = np.asarray(
        _run_press_compiled(
            1, n_steps=4, solver="iterative", newton_iters=150
        )["u"]
    )
    assert abs(ud).max() > 1e-3
    # both solvers converge the linear solves to rel 1e-8; over the
    # stiff contact steps the trajectories accumulate ~1e-8 of
    # solver-path difference
    assert np.allclose(ud, ug, atol=2.5e-7), np.abs(ud - ug).max()


@pytest.mark.slow
def test_consistent_contact_tangent():
    """contact_tangent='consistent' must (a) converge quadratically —
    single-digit Newton iterations on a press step where the frozen-
    pressure tangent needs ~100 — and (b) land on the same trajectory.
    The exactness of the jvp rests on the envelope-theorem gap
    derivative (contact/mortar.py pressure_pass)."""
    cf = _run_press_compiled(
        1, n_steps=4, solver="iterative", newton_iters=150,
        contact_tangent="frozen",
    )
    cc = _run_press_compiled(
        1, n_steps=4, solver="iterative", newton_iters=15,
        contact_tangent="consistent",
    )
    assert bool(cf["newton"]["converged"])
    assert bool(cc["newton"]["converged"])
    # quadratic vs linear convergence on the engaged step
    assert int(cc["newton"]["iters"]) <= 8
    assert int(cf["newton"]["iters"]) >= 3 * int(cc["newton"]["iters"])
    uf, uc = np.asarray(cf["u"]), np.asarray(cc["u"])
    assert abs(uf).max() > 1e-3
    assert np.allclose(uf, uc, atol=1e-8), np.abs(uf - uc).max()


@pytest.mark.slow
def test_reference_penalty_regime_iterative():
    """The reference's nl_contact press runs at penalty 1e11 with
    E=1e10 (/root/reference/examples/nl_contact.py:86); VERDICT r2 weak
    #5: nothing exercised that regime on the iterative path.  Here the
    same material/penalty/dt at test scale runs through FDM-GMRES with
    the contact boundary spring (solvers/fdm.py) and the consistent
    contact tangent, against dense-LU/frozen as the baseline."""
    from mimi_tpu.splines import Bezier

    def build():
        # press-test geometry (rigid line 0.02 outside the attr-1 edge)
        # with the REFERENCE nl_contact regime: density 7e4, E=1e10,
        # penalty 1e11, dt 1e-3, 0.005/step push
        mat = mimi.CompressibleOgdenNeoHookean()
        mat.density = 7e4
        mat.viscosity = -1.0
        mat.set_young_poisson(1e10, 0.3)
        tool = Bezier([1], [[-1.885, 2.464], [1.903, 0.570]])
        scene = mimi.NearestDistanceToSplines()
        scene.add_spline(tool)
        scene.plant_kd_tree(500, 1)
        scene.coefficient = 1e11
        prob = sh.build_problem(
            os.path.join(DATA, "square-nurbs.mesh"), 1, 2, mat,
            [(0, 0), (0, 1)], {}, rho_inf=0.5,
            contact=[(1, scene)],
        )
        assert prob.fdm is not None  # contact spring decomposition holds
        return prob, scene, tool

    push = 0.005 * np.array([1.0, 2.0]) / np.sqrt(5.0)

    # 8-step press through the ITERATIVE path: the 1e11-regime solver
    # must converge at every engaged step
    prob, scene, tool = build()
    step_it = sh.make_step(
        prob, 1e-3, rel_tol=1e-10, abs_tol=1e-8,
        solver="iterative", newton_iters=30,
        contact_tangent="consistent", precond="fdm", cg_iters=150,
    )
    carry = sh.initial_carry(prob)
    for _ in range(8):
        tool.cps[:] -= push
        scene.plant_kd_tree(500, 1)
        carry = step_it(carry, contact_scenes=[scene.scene_data()])
        assert bool(carry["newton"]["converged"]), float(
            carry["newton"]["norm"]
        )
    ui8 = np.asarray(carry["u"])
    assert abs(ui8).max() > 1e-4  # engaged

    # dense-vs-iterative equivalence on ONE step from the SAME engaged
    # state: 1e11-stiff tangents amplify ulp-level compile/codegen
    # differences chaotically over a multi-step press (measured: the
    # same pytest invocation flips pass/fail with fresh vs cache-loaded
    # XLA:CPU executables), so the cross-solver claim — GMRES at rel
    # 1e-8 with the FDM contact spring tracks the direct solve — is
    # asserted step-locally where conditioning bounds the difference.
    step_de = sh.make_step(
        prob, 1e-3, rel_tol=1e-10, abs_tol=1e-8,
        solver="dense", newton_iters=200,
    )
    tool.cps[:] -= push
    scene.plant_kd_tree(500, 1)
    sd = [scene.scene_data()]
    cd1 = step_de(dict(carry), contact_scenes=sd)
    ci1 = step_it(dict(carry), contact_scenes=sd)
    assert bool(cd1["newton"]["converged"]), float(cd1["newton"]["norm"])
    assert bool(ci1["newton"]["converged"]), float(ci1["newton"]["norm"])
    ud, ui = np.asarray(cd1["u"]), np.asarray(ci1["u"])
    assert np.allclose(ud, ui, atol=5e-6), np.abs(ud - ui).max()


def test_consistent_tangent_guardrail():
    prob, _, _ = _press_problem()
    with pytest.raises(ValueError, match="iterative"):
        sh.make_step(
            prob, 0.01, solver="dense", contact_tangent="consistent"
        )


def test_compiled_newton_diagnostics():
    prob = sh.build_problem(
        os.path.join(DATA, "balken.mesh"), 2, 1, _neo_mat(),
        [(2, 0), (2, 1)], {1: -3.0}, rho_inf=0.5,
    )
    step = sh.make_step(prob, 0.5, newton_iters=20, solver="dense")
    carry = step(sh.initial_carry(prob))
    nd = carry["newton"]
    assert bool(nd["converged"])
    assert 0 < int(nd["iters"]) <= 20
    assert float(nd["norm"]) <= max(
        1e-8 * float(nd["norm0"]), 1e-12
    )


def test_pallas_guardrails():
    """Unsupported feature combos must raise loudly, not silently drop
    physics.  (Viscosity and contact are kernel-supported since round 2;
    the remaining guardrails are solver kind, dtype and SoA support.)"""
    m = _neo_mat()
    m.viscosity = 10.0
    prob = sh.build_problem(
        os.path.join(DATA, "balken.mesh"), 1, 1, m,
        [(2, 0), (2, 1)], {1: -1.0}, dtype=jnp.float32,
    )
    # dense solver cannot host the kernel engines
    with pytest.raises(ValueError, match="iterative"):
        sh.make_step(prob, 0.1, residual_impl="pallas")
    # f64 problems are not kernel-eligible
    prob64 = sh.build_problem(
        os.path.join(DATA, "balken.mesh"), 1, 1, _neo_mat(),
        [(2, 0), (2, 1)], {1: -1.0},
    )
    with pytest.raises(ValueError, match="float32"):
        sh.make_step(
            prob64, 0.1, solver="cg", residual_impl="pallas"
        )


def test_conv_scatter_matches_slices():
    """The conv-based matvec scatter (_conv_scatter, one transposed
    conv with delta taps) must equal the slice-based overlap-add
    exactly in f32 — anisotropic spans/degrees, 2D/3D, padding.  (On
    TPU it runs at the MXU's default precision and is gated to the
    bf16 Krylov operator; this exactness test pins the indexing.)"""
    rng = np.random.default_rng(0)
    cases = [
        ([5, 4, 3], [3, 3, 3], 0),
        ([6, 5], [4, 3], 0),
        ([4, 4, 4], [3, 3, 3], 8),
        ([7, 3], [2, 4], 3),
    ]
    for spans, pp1, npad in cases:
        dim = len(spans)
        nc = [s + p - 1 for s, p in zip(spans, pp1)]
        nd = int(np.prod(pp1))
        n_el = int(np.prod(spans))
        n_dof = int(np.prod(nc))
        y = jnp.asarray(
            rng.standard_normal((dim, nd, n_el + npad)), jnp.float32
        )
        a = np.asarray(
            sh._structured_scatter(y, dim, spans, pp1, nc, n_dof, npad)
        )
        b = np.asarray(
            sh._conv_scatter(y, dim, spans, pp1, nc, n_dof, npad)
        )
        assert np.allclose(a, b, atol=1e-5), (
            spans, pp1, npad, np.abs(a - b).max()
        )


@pytest.mark.slow
def test_contact_schur_preconditioner():
    """precond='schur' (FDM + additive mortar face-block correction,
    solvers/fdm.py build_contact_face_schur — VERDICT r3 next #2):
    preconditioning must not move the converged trajectory, and the
    GMRES iteration count on an engaged 3D press must drop vs the
    spring-only FDM (the separable spring's measured ~30-its plateau
    comes from mis-weighting oscillatory face modes; the face block
    carries the exact mortar double-average)."""
    from mimi_tpu.splines import Bezier

    mat = mimi.CompressibleOgdenNeoHookean()
    mat.density = 1e3
    mat.viscosity = 100.0
    mat.set_young_poisson(1e6, 0.3)
    tool = Bezier(
        [1, 1],
        [
            [-0.5, -0.5, 1.02],
            [-0.5, 1.5, 1.02],
            [1.5, -0.5, 1.02],
            [1.5, 1.5, 1.02],
        ],
    )
    scene = mimi.NearestDistanceToSplines()
    scene.add_spline(tool)
    scene.plant_kd_tree(50, 1)
    scene.coefficient = 5e7
    prob = sh.build_problem(
        os.path.join(DATA, "cube-nurbs.mesh"), 1, 2,
        mat, [(0, 0), (0, 1), (0, 2)], {}, rho_inf=0.5,
        contact=[(1, scene)],
    )
    assert prob.fdm is not None

    outs = {}
    for pc in ("fdm", "schur"):
        step = sh.make_step(
            prob, 0.01, rel_tol=1e-8, abs_tol=1e-10,
            solver="iterative", newton_iters=30,
            contact_tangent="consistent", precond=pc, cg_iters=200,
            lin_rel_tol=1e-4,
        )
        carry = sh.initial_carry(prob)
        lin_total = 0
        sd = jax.tree.map(jnp.asarray, scene.scene_data())
        push = jnp.asarray([0.0, 0.0, -0.01])
        for _ in range(5):
            sd = mimi.NearestDistanceToSplines.translate_scene_data(
                sd, push
            )
            carry = step(carry, contact_scenes=[sd])
            assert bool(carry["newton"]["converged"])
            lin_total += int(carry["newton"]["lin_iters"])
        outs[pc] = (np.asarray(carry["u"]), lin_total)

    u_f, it_f = outs["fdm"]
    u_s, it_s = outs["schur"]
    assert np.abs(u_f).max() > 1e-4  # engaged
    assert np.allclose(u_f, u_s, atol=5e-7), np.abs(u_f - u_s).max()
    # the correction must pay for itself on the engaged press
    assert it_s < it_f, (it_s, it_f)


def test_contact_schur_guardrails():
    """schur without contact or tensor structure raises clearly."""
    mat = mimi.CompressibleOgdenNeoHookean()
    mat.density = 1.0
    mat.viscosity = -1.0
    mat.set_young_poisson(2100.0, 0.3)
    prob = sh.build_problem(
        os.path.join(DATA, "cube-nurbs.mesh"), 1, 1,
        mat, [(0, 0), (0, 1), (0, 2)], {1: -3.0}, rho_inf=0.5,
    )
    with pytest.raises(ValueError, match="contact face"):
        sh.make_step(prob, 0.05, solver="cg", precond="schur")
