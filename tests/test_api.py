"""API-surface parity tests: views, dof maps, to_splinepy, traction and
constant-velocity boundary conditions, FSI fixed-point trio,
RuntimeCommunication npz export."""

import os

import numpy as np
import pytest

import mimi_tpu as mimi

DATA = os.path.join(os.path.dirname(__file__), "data")


def _basic(mesh="balken.mesh", elevate=1, subdivide=1):
    nl = mimi.NonlinearSolid()
    nl.read_mesh(os.path.join(DATA, mesh))
    if elevate:
        nl.elevate_degrees(elevate)
    if subdivide:
        nl.subdivide(subdivide)
    mat = mimi.CompressibleOgdenNeoHookean()
    mat.density = 1
    mat.viscosity = -1
    mat.set_young_poisson(2100, 0.3)
    nl.set_material(mat)
    return nl


def test_to_splinepy_roundtrip():
    nl = _basic()
    s, to_m, to_s = mimi.to_splinepy(nl)
    d = nl.nurbs()
    # permutations invert each other
    assert np.array_equal(to_m[to_s], np.arange(len(to_s)))
    # cps in lex order = mfem cps gathered by to_s
    assert np.allclose(s.cps, np.asarray(d["control_points"])[to_s])
    # spline evaluates to the same geometry as the patch
    pts = s.sample([5, 5])
    ref = nl._patch.evaluate(
        np.stack(
            np.meshgrid(
                np.linspace(0, 1, 5), np.linspace(0, 1, 5), indexing="ij"
            ),
            -1,
        ).reshape(-1, 2, order="F")[:, :]
    )
    # sample uses F-order flat; build matching params
    lo = np.linspace(0, 1, 5)
    params = np.stack(
        [g.reshape(-1, order="F") for g in np.meshgrid(lo, lo, indexing="ij")],
        -1,
    )
    ref = nl._patch.evaluate(params)
    assert np.allclose(pts, ref, atol=1e-10)


def test_multi_index():
    nl = _basic()
    s, to_m, to_s = mimi.to_splinepy(nl)
    mi = s.multi_index
    nc = nl._patch.n_ctrl()
    # last column of the grid (i = -1, all j)
    idx = mi[-1, :]
    assert len(idx) == nc[1]
    assert idx[0] == nc[0] - 1


def test_spline_extract():
    """splinepy-surface extraction (the toy_problem geometry path,
    reference examples/toy_problem.py:117-133): boundary curves are the
    control-polygon slices; a parametric restriction samples the
    original spline; a degree-1 axis restriction is the exact linear
    blend of the two boundary curves."""
    from mimi_tpu.splines import BSpline

    kv_u = [0.0, 0.0, 0.0, 1.0, 2.0, 3.0, 3.0, 3.0]
    kv_v = [0.0, 0.0, 1.0, 1.0]
    rng = np.random.default_rng(3)
    cps = rng.normal(size=(10, 2))
    s = BSpline([2, 1], cps, [kv_u, kv_v])
    lo, hi = s.extract.boundaries([2, 3])
    assert np.allclose(lo.cps, cps[:5]) and np.allclose(hi.cps, cps[5:])
    west, east = s.extract.boundaries([0, 1])
    assert np.allclose(west.cps, cps[[0, 5]])
    assert np.allclose(east.cps, cps[[4, 9]])
    path = s.extract.spline(1, [0.25, 0.75]).sample([9, 2])
    a = lo.sample(9)
    b = hi.sample(9)
    assert np.allclose(path[:9], 0.75 * a + 0.25 * b, atol=1e-12)
    assert np.allclose(path[9:], 0.25 * a + 0.75 * b, atol=1e-12)


def test_traction_rhs():
    """Total assembled traction force equals traction * edge length."""
    nl = _basic("balken.mesh", elevate=1, subdivide=1)
    bc = mimi.BoundaryConditions()
    bc.initial.dirichlet(2, 0).dirichlet(2, 1)
    # attr 4 (bid 3) is the right edge x=5 of the balken beam, length 1
    bc.initial.traction(3, 0, 2.5)
    nl.boundary_condition = bc
    nl.setup(1)
    rhs = np.asarray(nl._system.rhs)
    # dirichlet rows zeroed; total x-force = 2.5 * length(=1)
    assert np.isclose(rhs[:, 0].sum(), 2.5, atol=1e-12)
    assert np.allclose(rhs[:, 1], 0.0)


def test_constant_velocity_bc():
    nl = _basic()
    bc = mimi.BoundaryConditions()
    bc.initial.dirichlet(2, 0).dirichlet(2, 1)
    bc.initial.constant_velocity(3, 1, 0.1)  # right edge moves up
    nl.boundary_condition = bc
    nl.setup(1)
    nl.time_step_size = 0.05
    u = nl.solution_view("displacement", "x").reshape(-1, 2)
    for i in range(4):
        nl.step_time2()
    # boundary dofs on bid 3 moved with v=0.1: u_y = v * t
    sd = nl._system.fes.side_dofs(3)
    uy = np.asarray(nl._system.u)[sd, 1]
    assert np.allclose(uy, 0.1 * nl.current_time, atol=1e-12), uy


def test_fixed_point_trio():
    """FixedPointSolve2/Advance2/AdvanceTime2 co-simulation pattern
    (ode.cpp:81-187): repeated solves then a commit must equal the result
    of plain step_time2 on an identical system."""
    def mk():
        nl = _basic()
        bc = mimi.BoundaryConditions()
        bc.initial.dirichlet(2, 0).dirichlet(2, 1)
        bc.initial.body_force(1, -5)
        nl.boundary_condition = bc
        nl.setup(1)
        nl.configure_newton("nonlinear_solid", 1e-12, 1e-8, 10, False)
        nl.time_step_size = 0.05
        return nl

    a, b = mk(), mk()
    for _ in range(2):
        a.step_time2()

        b.fixed_point_solve2()
        fx, fv = b.fixed_point_advance2()  # preview, non-committing
        b.fixed_point_solve2()  # repeat solve (fsi iteration)
        b.advance_time2()

    ua = np.asarray(a._system.u)
    ub = np.asarray(b._system.u)
    assert np.allclose(ua, ub, atol=1e-10), np.abs(ua - ub).max()
    assert np.isclose(a.current_time, b.current_time)


def test_runtime_communication_npz(tmp_path):
    nl = _basic()
    bc = mimi.BoundaryConditions()
    bc.initial.dirichlet(2, 0).dirichlet(2, 1)
    bc.initial.body_force(1, -5)
    nl.boundary_condition = bc
    rc = mimi.RuntimeCommunication()
    fname = str(tmp_path / "out.npz")
    rc.set_fname(fname)
    rc.append_should_save("x", 1)
    rc.append_should_save("v", 2)
    nl.runtime_communication = rc
    nl.setup(1)
    nl.time_step_size = 0.05
    for _ in range(4):
        nl.step_time2()
    data = np.load(fname)
    # x saved every step, v every other step (timestep-modulo gate)
    assert set(data.files) >= {"x_0", "x_1", "x_2", "x_3", "v_0", "v_2"}
    assert "v_1" not in data.files
    # saved vector matches the live view (mfem ordering)
    u = nl.solution_view("displacement", "x").ravel()
    assert np.allclose(data["x_3"], u)
    # latest_vector access
    assert np.allclose(rc.latest_vector("x_"), u)


def test_boundary_dof_ids_and_zero_dofs():
    nl = _basic()
    bc = mimi.BoundaryConditions()
    bc.initial.dirichlet(2, 0).dirichlet(2, 1)
    nl.boundary_condition = bc
    nl.setup(1)
    ids = nl.boundary_dof_ids("displacement", 2, 0)
    zero = nl.zero_dof_ids("displacement")
    # balken h1p2: 4x4 cps; left edge has 4 dofs
    assert len(ids) == 4
    assert len(zero) == 8
    assert set(ids).issubset(set(zero))
    # vdofs are even (x component, byVDIM)
    assert all(i % 2 == 0 for i in ids)


def test_newton_final_norms():
    nl = _basic()
    bc = mimi.BoundaryConditions()
    bc.initial.dirichlet(2, 0).dirichlet(2, 1)
    bc.initial.body_force(1, -5)
    nl.boundary_condition = bc
    nl.setup(1)
    nl.time_step_size = 0.05
    nl.step_time2()
    rel, absn = nl.newton_final_norms()
    assert absn < 1e-8
    assert rel < 1e-8


def test_periodic_boundaries():
    """ConnectBoundaries semantics: left-right dof identification on the
    beam; displacements on the two connected edges stay identical."""
    nl = _basic("balken.mesh", elevate=1, subdivide=1)
    bc = mimi.BoundaryConditions()
    bc.initial.dirichlet(0, 0).dirichlet(0, 1)  # fix bottom edge
    bc.initial.body_force(1, -5)
    bc.initial.periodic(3, 4)  # 1-based attrs: left <-> right
    nl.boundary_condition = bc
    nl.setup(1)
    sysm = nl._system
    assert sysm.n_dof == sysm.fes.n_dof - 4  # 4 identified pairs (4x4 grid)
    dm = nl.dof_map()
    assert len(dm) == sysm.fes.n_dof
    assert len(np.unique(dm)) == sysm.n_dof
    nl.time_step_size = 0.05
    for _ in range(3):
        nl.step_time2()
    u = np.asarray(sysm.u)
    assert np.isfinite(u).all()
    assert np.abs(u).max() > 1e-6  # it moved
    # connected edges share dofs: gather full-space solution, edges equal
    left = sysm.fes.side_dofs(2)
    right = sysm.fes.side_dofs(3)
    u_full = u[sysm.red_index]
    assert np.allclose(u_full[left], u_full[right])


def test_checkpoint_resume(tmp_path):
    """Full-state save/resume: a resumed run must continue bit-identically
    (a capability the reference lacks; SURVEY.md §5)."""
    def mk(mat_cls=mimi.J2):
        nl = mimi.NonlinearSolid()
        nl.read_mesh(os.path.join(DATA, "balken.mesh"))
        nl.elevate_degrees(1)
        nl.subdivide(1)
        mat = mat_cls()
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
        nl.set_material(mat)
        rc = mimi.RuntimeCommunication()
        rc.set_real("ode_coefficient", 0.5)
        nl.runtime_communication = rc
        bc = mimi.BoundaryConditions()
        bc.initial.dirichlet(2, 0).dirichlet(2, 1)
        bc.initial.body_force(1, -3)
        nl.boundary_condition = bc
        nl.setup(1)
        nl.configure_newton("nonlinear_solid", 1e-12, 1e-8, 10, False)
        nl.time_step_size = 0.5
        return nl

    a = mk()
    for _ in range(3):
        a.step_time2()
    ckpt = str(tmp_path / "state.npz")
    a.save_checkpoint(ckpt)
    for _ in range(3):
        a.step_time2()

    b = mk()
    b.load_checkpoint(ckpt)
    assert np.isclose(b.current_time, 1.5)
    for _ in range(3):
        b.step_time2()

    ua = np.asarray(a._system.u)
    ub = np.asarray(b._system.u)
    assert np.allclose(ua, ub, atol=1e-14), np.abs(ua - ub).max()
    # plastic state resumed too
    assert np.allclose(
        np.asarray(a._system.state["eqps"]),
        np.asarray(b._system.state["eqps"]),
    )


def test_hardening_binding_surface():
    """The reference's pybind surface (py_hardening.cpp:25-40): base
    `sigma_y()` METHOD (shadowed by the `sigma_y` data attribute on
    PowerLaw/Voce, exactly as def_readwrite shadows the base def) and
    `visco_evaluate(eqps, eqps_dot)` = Evaluate * RateContribution
    (material_hardening.hpp:184-191; raises on rate-independent laws
    like HardeningBase's two-arg Evaluate, hpp:36-39)."""
    h = mimi.JohnsonCookRateDependentHardening()
    h.A, h.B, h.n = 70.0, 140.0, 0.2835
    h.C, h.eps0_dot = 0.05, 0.004
    assert float(h.sigma_y()) == 70.0
    eqps, rate = 0.02, 0.1
    expect = float(h.evaluate(eqps)) * (
        1.0 + h.C * np.log(rate / h.eps0_dot)
    )
    assert np.isclose(float(h.visco_evaluate(eqps, rate)), expect)
    # below the reference rate the contribution clamps to 1
    assert np.isclose(
        float(h.visco_evaluate(eqps, 1e-6)), float(h.evaluate(eqps))
    )

    # rate-independent law: visco_evaluate raises (hpp:36-39) and the
    # sigma_y data attribute shadows the method (def_readwrite)
    p = mimi.PowerLawHardening()
    p.sigma_y, p.n, p.eps0 = 50.0, 2.0, 1e-3
    assert p.sigma_y == 50.0
    with pytest.raises(NotImplementedError):
        p.visco_evaluate(0.1, 0.1)

    jc = mimi.JohnsonCookHardening()
    jc.A, jc.B, jc.n = 70.0, 140.0, 0.2835
    assert float(jc.sigma_y()) == 70.0
    with pytest.raises(NotImplementedError):
        jc.visco_evaluate(0.1, 0.1)


def test_pyad():
    """PyAD parity (py_ad.cpp): forward-AD scalar arithmetic."""
    x = mimi.PyAD.variable(2.0)
    y = (x * x + 3.0 * x + 1.0) / x
    # f = (x^2+3x+1)/x -> f(2) = 11/2; f' = 1 - 1/x^2 -> 3/4
    assert np.isclose(y.get_value(), 5.5)
    assert np.isclose(y.get_derivatives(0), 0.75)
    z = x.sqrt().exp()
    import math

    assert np.isclose(z.get_value(), math.exp(math.sqrt(2)))


def _ode_preset_run(factories):
    """Step the same operator with each named preset (ode.hpp:130-269);
    return name -> |u|max after 5 steps."""
    from mimi_tpu.solvers import ode as ode_mod

    def mk():
        nl = _basic()
        bc = mimi.BoundaryConditions()
        bc.initial.dirichlet(2, 0).dirichlet(2, 1)
        bc.initial.body_force(1, -5)
        nl.boundary_condition = bc
        nl.setup(1)
        nl.time_step_size = 0.05
        return nl

    results = {}
    for name, factory in factories:
        nl = mk()
        if factory is not None:
            nl._system.ode = factory(nl._system)
        for _ in range(5):
            nl.step_time2()
        u = np.asarray(nl._system.u)
        assert np.isfinite(u).all(), name
        results[name] = np.abs(u).max()
    return results


def test_ode_presets():
    """Core presets: gen-alpha default vs the two Newmark-family
    workhorses (ode.hpp:130-142,196-247)."""
    from mimi_tpu.solvers import ode as ode_mod

    results = _ode_preset_run([
        ("gen_alpha", None),  # default
        ("newmark", lambda op: ode_mod.Newmark(op)),
        ("avg_accel", lambda op: ode_mod.AverageAcceleration(op)),
    ])
    # unconditionally stable schemes agree in magnitude
    stable = list(results.values())
    assert max(stable) < 2.0 * min(stable), results
    # Newmark (beta 1/4 gamma 1/2) ~ AverageAcceleration: identical for
    # linear problems; for nonlinear E the alpha-level evaluation differs
    # (midpoint vs endpoint), so only near agreement is expected
    assert np.isclose(results["newmark"], results["avg_accel"], rtol=1e-3)


@pytest.mark.slow
def test_ode_presets_extended():
    """Remaining presets: HHT/WBZ dissipative alphas + the conditionally
    stable Fox-Goodwin (ode.hpp:150-189,249-269)."""
    from mimi_tpu.solvers import ode as ode_mod

    results = _ode_preset_run([
        ("gen_alpha", None),
        ("hht", lambda op: ode_mod.HHTAlpha(op, 0.9)),
        ("wbz", lambda op: ode_mod.WBZAlpha(op, 0.8)),
        ("fox_goodwin", lambda op: ode_mod.FoxGoodwin(op)),
    ])
    # unconditionally stable schemes agree in magnitude (Fox-Goodwin is
    # only conditionally stable and legitimately oscillates at this dt)
    stable = [results[k] for k in ("gen_alpha", "hht", "wbz")]
    assert max(stable) < 2.0 * min(stable), results
