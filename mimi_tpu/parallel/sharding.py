"""Functional problem core + multi-chip sharding.

The interactive `NonlinearSolid` session keeps Newton orchestration in
Python for live steering (views, FSI fixed-point).  This module provides
the *compiled* counterpart used for benchmarking and scale-out: one fully
jitted generalized-alpha step (predict -> while_loop Newton with the
3-point line search and the reference's stopping semantics -> correct ->
state accumulate), covering the full operator of the reference
(/root/reference/src/mimi/operators/nonlinear_solid.cpp:172-205):

    r = M a + S (v + fac1 a) + E(x + fac0 a) + contact(x + fac0 a) - f

with viscosity S, traction/body-force right-hand side, constant-velocity
dynamic Dirichlet rows (boundary_conditions.cpp:204-291) and mortar
penalty contact (mortar_contact.cpp:148-421; two-pass, frozen-pressure
consistent tangent).

Newton stopping matches LineSearchNewton (newton.cpp:99-202): goal =
max(rel*|r0|, abs), non-finite abort, line-search scale floor 1e-12,
best-iterate window of 5 improvements, best-x returned on
non-convergence.

Multi-chip design (the TPU-native replacement for the reference's
shared-memory element loop, n_thread_exe.hpp:37-97): a 1D
`jax.sharding.Mesh` over axis "e"; all (n_elem, ...) quadrature tables,
contact boundary tables and material-state arrays are sharded along "e",
dof vectors are replicated.  XLA turns the element-batch scatter-add into
local scatters + an all-reduce over ICI; dot products in Newton/CG reduce
with psum.  Elements are padded with zero-measure entries (w_detJ = 0 ->
F = I; contact: duplicated geometry with wq = 0) to a multiple of the
device count, so padding contributes exactly zero.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fem import kernels as K
from ..fem import soa
from ..fem.space import FESpace
from ..nurbs.mesh_io import read_mfem_nurbs_mesh
from ..nurbs.topology import build_patch_from_mesh
from ..solvers.linear import (
    pcg,
    gmres,
    block_jacobi_inverse,
    block_jacobi_apply,
)
from ..solvers.fdm import build_fdm_data, make_fdm_apply
from ..contact.mortar import make_contact_fns


@dataclass
class Problem:
    """Pytree-able problem data + static config for the compiled step."""

    material: object
    n_dof: int
    dim: int
    n_el: int
    n_q: int
    # element tables (shardable along axis 0)
    conn: jnp.ndarray
    dN_dX: jnp.ndarray
    w_detJ: jnp.ndarray
    N: jnp.ndarray
    mass_blocks: jnp.ndarray  # scalar blocks, same conn
    # dof data (replicated)
    rhs: jnp.ndarray
    free: jnp.ndarray  # (n_dof, dim) 1.0/0.0
    # gen-alpha factors
    facs: dict
    state0: object  # material state pytree or None
    # optional physics (None when absent)
    visc_blocks: jnp.ndarray | None = None
    cv_mask: jnp.ndarray | None = None  # (n_dof, dim) 1.0/0.0
    cv_vals: jnp.ndarray | None = None  # (n_dof, dim)
    # mortar contact: per block a dict of element tables + scene data
    # (arrays, shardable along axis 0 except scene/penalty) and a static
    # companion (n_local, query fn)
    contact: list = field(default_factory=list)
    contact_static: list = field(default_factory=list)
    # True when state0 (and the carry state) use the SoA layout
    # (fem/soa.py): tensor dims leading, (n_el, n_q) trailing — the
    # TPU-tiling-friendly layout the compiled hot path runs in
    state_soa: bool = False
    # tensor-product fast-diagonalization preconditioner data
    # (solvers/fdm.py), or None when the patch/BCs don't factorize
    fdm: dict | None = None
    # structured-grid info for slice-based gather/scatter (single
    # patch): {"spans", "nc", "pp1"}; None for multi-patch problems
    grid: dict | None = None
    # sum-factorization factors for the pallas matvec (ops/sweeps.py
    # build_sf_tables): {"tables": [B0,D0,B1,D1,B2,D2], "jinv", "n_g",
    # "pp1"}; None when the basis is rational / non-3D / multi-patch
    sf: dict | None = None
    # reference control-point coordinates (n_dof, dim), numpy
    x_ref: np.ndarray | None = None

    def tree_arrays(self):
        return [
            "conn",
            "dN_dX",
            "w_detJ",
            "N",
            "mass_blocks",
            "rhs",
            "free",
        ]


def build_problem(
    mesh_path,  # str path, or an already-parsed mesh_io mesh object
    elevate: int,
    subdivide: int,
    material,
    dirichlet: list,  # [(bid, dim), ...]
    body_force: dict,  # {dim: value}
    rho_inf: float = 0.25,
    dtype=jnp.float64,
    pad_multiple: int = 1,
    traction: dict | None = None,  # {bid: {dim: value}}
    constant_velocity: dict | None = None,  # {bid: {dim: value}}
    contact: list | None = None,  # [(bid, scene), ...]
    contact_quadrature_order: int = -1,
    refine_spans: int | list | None = None,  # exact span count per axis
    periodic: dict | None = None,  # {bid0: bid1}, 0-based like dirichlet
    quadrature_order: int = -1,  # rc nonlinear_solid_quadrature_order
    fes=None,  # reuse an existing (already-refined) FESpace /
    # MultiPatchFESpace: elevate/subdivide/refine_spans are ignored
) -> Problem:
    """Assemble the compiled-core problem description.

    Feature parity with PyNonlinearSolid::Setup
    (py_nonlinear_solid.cpp:15-387): mass, viscosity (material.viscosity
    > 0), body-force + traction right-hand side, static and
    constant-velocity Dirichlet, mortar contact blocks, periodic
    boundary dof identification (`NURBSExtension::ConnectBoundaries`
    semantics, py_nonlinear_solid.cpp:34-75 — assembly scatters through
    the reduced dof set, same machinery as the session's
    fem.space.build_periodic_map).
    """
    multipatch = False
    if fes is None:
        mesh = (
            read_mfem_nurbs_mesh(mesh_path)
            if isinstance(mesh_path, str)
            else mesh_path
        )
        multipatch = len(mesh.elements) > 1
        if multipatch:
            from ..fem.multipatch import MultiPatchFESpace

            fes = MultiPatchFESpace(
                mesh,
                elevate=elevate,
                subdivide=subdivide,
                refine_spans=refine_spans,
            )
        else:
            patch, topo, _ = build_patch_from_mesh(mesh)
            if elevate > 0:
                patch.elevate_degrees(elevate)
            for _ in range(subdivide):
                patch.uniform_refine()
            if refine_spans is not None:
                patch.refine_to(refine_spans)
            fes = FESpace(patch, topo)
    else:
        multipatch = not hasattr(fes, "patch")
    grid = None
    if not multipatch:
        patch = fes.patch
        # the slice-based structured gather/scatter assumes the 1D dof
        # window of element s starts at s (starts == arange), which holds
        # iff every interior knot is simple: n_ctrl = n_span + p per axis.
        # A repeated interior knot makes the slice map silently disagree
        # with the conn-based gather — leave grid=None there.
        _nc = list(patch.n_ctrl())
        _sp = list(patch.n_spans())
        if all(
            _nc[k] == _sp[k] + patch.degrees[k] for k in range(len(_nc))
        ):
            grid = {
                "spans": _sp,
                "nc": _nc,
                "pp1": [p_ + 1 for p_ in patch.degrees],
            }
    dim = fes.dim
    n_dof = fes.n_dof
    red_index = masters = None
    if periodic:
        # multi-patch spaces pair periodic dofs geometrically inside
        # build_periodic_map (fem/space.py _periodic_pairs_geometric)
        from ..fem.space import build_periodic_map

        red_index, n_dof, masters = build_periodic_map(
            fes, {b0 + 1: b1 + 1 for b0, b1 in periodic.items()}
        )
        # the identified dof set breaks the tensor-product dof grid:
        # the slice-based gather/scatter and the separable FDM
        # surrogate are both invalid there
        grid = None
    material.setup(dim)

    def remap(dofs):
        """Full scalar dof ids -> reduced (periodic) dof ids."""
        return dofs if red_index is None else red_index[dofs]

    tables = fes.domain_tables(quadrature_order)
    # mass (+ viscosity) share the stiffness quadrature: one conn array
    # for sharding; exact for affine geometry (the 2p+3 rule
    # over-integrates the polynomial mass/diffusion integrands)
    mass_blocks = K.scalar_blocks_mass(tables, material.density)
    visc_blocks = (
        K.scalar_blocks_diffusion(tables, material.viscosity)
        if material.viscosity > 0.0
        else None
    )

    dir_pairs = list(dirichlet)
    cv_mask = cv_vals = None
    if constant_velocity:
        # constant-velocity rows are Dirichlet rows with a dynamic value
        # (boundary_conditions.cpp:127-137 auto-adds dirichlet)
        cv_mask = np.zeros((n_dof, dim))
        cv_vals = np.zeros((n_dof, dim))
        for bid, dim_vals in constant_velocity.items():
            sd = remap(fes.side_dofs(bid))
            for d_, val in dim_vals.items():
                dir_pairs.append((bid, d_))
                cv_mask[sd, d_] = 1.0
                cv_vals[sd, d_] = val

    zero_mask = fes.boundary_dof_mask(_merge_dirichlet(dir_pairs))
    if red_index is not None:
        zm_red = np.zeros((n_dof, dim), dtype=bool)
        np.logical_or.at(zm_red, red_index, zero_mask)
        zero_mask = zm_red
    free = (~zero_mask).astype(np.float64)

    rhs = np.zeros((n_dof, dim))
    if body_force:
        nodal = np.einsum(
            "eq,eqn->en", tables.w_detJ, tables.N, optimize=True
        )
        acc = np.zeros(n_dof)
        np.add.at(acc, remap(tables.conn), nodal)
        for c, val in body_force.items():
            rhs[:, c] += acc * val
    if traction:
        # VectorBoundaryLFIntegrator over PWConstCoefficient
        # (py_nonlinear_solid.cpp:221-283)
        bt = fes.boundary_tables(-1)
        for bid, dim_vals in traction.items():
            sel = np.nonzero(bt.attr == bid + 1)[0]
            nodal = np.einsum(
                "eq,eq,eqn->en",
                bt.wq[sel],
                bt.detJ_ref[sel],
                bt.N[sel],
                optimize=True,
            )
            acc = np.zeros(n_dof)
            np.add.at(acc, remap(bt.conn[sel]), nodal)
            for c, val in dim_vals.items():
                rhs[:, c] += acc * val
    if body_force or traction:
        rhs[zero_mask] = 0.0

    n_el, n_q, n_dof_el = tables.N.shape
    # pad element batch
    n_pad = (-n_el) % pad_multiple
    def padel(a, fill=0.0):
        if n_pad == 0:
            return a
        pad_shape = (n_pad,) + a.shape[1:]
        return np.concatenate([a, np.full(pad_shape, fill, a.dtype)])

    conn = padel(remap(tables.conn), 0)
    dN_dX = padel(tables.dN_dX)
    w_detJ = padel(tables.w_detJ)
    N = padel(tables.N)
    mblocks = padel(mass_blocks)
    vblocks = padel(visc_blocks) if visc_blocks is not None else None

    # sum-factorization factors for the pallas matvec (ops/sweeps.py
    # make_matvec_sweep_sf): per-element 1D basis tables + per-qp
    # dxi/dX.  Exact for polynomial bases only (rational quotients are
    # not separable); requires the tensor grid, equal degrees, and a
    # tensor quadrature.  Padded elements replicate element 0 (their
    # w_detJ is 0, so their contribution is exactly zero — replication
    # just keeps jinv finite).
    sf = None
    _n_g = round(n_q ** (1.0 / 3.0))
    if (
        grid is not None
        and dim == 3
        and masters is None
        and len(set(fes.patch.degrees)) == 1
        and _n_g**3 == n_q
        and np.allclose(np.asarray(fes.patch.weights).ravel(), 1.0)
    ):
        try:
            from ..ops.sweeps import build_sf_tables

            _tabs, _jinv = build_sf_tables(
                fes.patch,
                fes.x_ref,
                tables.conn,
                _n_g,
                np.float32 if dtype == jnp.float32 else np.float64,
            )

            def padlast(a):
                if n_pad == 0:
                    return a
                reps = np.repeat(a[..., :1], n_pad, axis=-1)
                return np.concatenate([a, reps], axis=-1)

            sf = {
                "tables": [padlast(t) for t in _tabs],
                "jinv": padlast(_jinv),
                "n_g": _n_g,
                "pp1": fes.patch.degrees[0] + 1,
            }
        except Exception as e:  # pragma: no cover - diagnostics only
            import sys as _sys

            print(
                f"# sum-factorization tables skipped: {e!r}",
                file=_sys.stderr,
            )
            sf = None

    rho = min(max(rho_inf, 0.0), 1.0)
    am = (2.0 - rho) / (1.0 + rho)
    af = 1.0 / (1.0 + rho)
    beta = 0.25 * (1.0 + am - af) ** 2
    gamma = 0.5 + am - af
    facs = dict(
        fac0=0.5 - beta / am,
        fac1=af,
        fac1_inv=1.0 / af,
        fac2=af * (1.0 - gamma / am),
        fac3=beta * af / am,
        fac4=gamma * af / am,
        fac5_inv=1.0 / am,
    )

    state0 = (
        material.init_state((n_el + n_pad, n_q))
        if material.has_state
        else None
    )
    # carry the state in the SoA layout (tensor dims leading) when the
    # material has a SoA fast path: every (n_el, n_q, d, d) buffer would
    # otherwise be tile-padded (3,3)->(8,128) by XLA-TPU, a ~114x
    # memory/bandwidth blow-up on the hot path
    state_soa = state0 is not None and getattr(material, "has_soa", False)
    if state_soa:
        state0 = soa.state_to_soa(state0)

    if red_index is not None:
        # no separable surrogate on the identified dof set
        fdm = None
    else:
        try:
            fdm = build_fdm_data(
                fes,
                dir_pairs,
                material,
                contact_springs=[
                    (bid, scene.coefficient)
                    for bid, scene in (contact or [])
                ],
            )
        except Exception as e:  # noqa: BLE001 — fall back to
            # block-Jacobi, but loudly: a silent None here masked real
            # regressions before
            from ..utils.log import print_warning

            print_warning(
                f"FDM preconditioner disabled ({type(e).__name__}: {e});"
                " iterative solves fall back to block-Jacobi"
            )
            fdm = None

    # domain tables stay HOST-side numpy on the Problem: make_step
    # device-puts only the layout the selected engine consumes (holding
    # both the batch-first and (q, e) copies on device exhausted HBM at
    # the 1e5-element scale); contact tables are small and stay jnp
    cast = lambda a: np.asarray(a, dtype) if a.dtype.kind == "f" else np.asarray(a)

    contact_data, contact_static = [], []
    if contact:
        bt = fes.boundary_tables(contact_quadrature_order)
        x_ref = fes.x_ref
        for bid, scene in contact:
            marked = np.nonzero(bt.attr == bid + 1)[0]
            if marked.size == 0:
                raise ValueError(
                    f"contact boundary {bid} marks no elements"
                )
            c_full = bt.conn[marked]  # full dofs: reference coords
            c_conn = remap(c_full)  # reduced dofs: u gather/scatter
            uniq = np.unique(c_conn)
            lookup = -np.ones(uniq.max() + 1, dtype=np.int64)
            lookup[uniq] = np.arange(len(uniq))
            ldof = lookup[c_conn]

            # pad by duplicating element 0's geometry with wq = 0: the
            # weight multiplies every residual/tangent contribution, so
            # padding is exactly zero yet keeps normals/dets finite
            # under jacfwd (zero tables would put NaNs in 0*d(norm))
            n_mb = len(marked)
            n_cpad = (-n_mb) % pad_multiple

            def padc(a, zero=False):
                if n_cpad == 0:
                    return a
                rep = np.repeat(a[:1], n_cpad, axis=0)
                if zero:
                    rep = np.zeros_like(rep)
                return np.concatenate([a, rep])

            dcast = (
                lambda a: jnp.asarray(a, dtype)
                if a.dtype.kind == "f"
                else jnp.asarray(a)
            )
            cd = {
                "conn": jnp.asarray(padc(c_conn)),
                "N": dcast(padc(bt.N[marked])),
                "dN": dcast(padc(bt.dN_dxi[marked])),
                "wq": dcast(padc(bt.wq[marked], zero=True)),
                "nsign": dcast(padc(bt.normal_sign[marked])),
                "ldof": jnp.asarray(padc(ldof)),
                "x_ref_el": dcast(x_ref[padc(c_full)]),
                "scene": jax.tree.map(
                    lambda a: jnp.asarray(a, dtype)
                    if jnp.asarray(a).dtype.kind == "f"
                    else jnp.asarray(a),
                    scene.scene_data(),
                ),
                "penalty": jnp.asarray(scene.coefficient, dtype),
            }
            contact_data.append(cd)
            contact_static.append(
                {
                    "n_local": len(uniq),
                    "query": scene.make_batched_query(),
                    "bid": bid,
                }
            )

    return Problem(
        material=material,
        n_dof=n_dof,
        dim=dim,
        n_el=n_el + n_pad,
        n_q=n_q,
        conn=np.asarray(conn),
        dN_dX=cast(dN_dX),
        w_detJ=cast(w_detJ),
        N=cast(N),
        mass_blocks=cast(mblocks),
        rhs=cast(rhs),
        free=cast(free),
        facs=facs,
        state0=jax.tree.map(lambda a: jnp.asarray(a, dtype), state0)
        if state0 is not None
        else None,
        visc_blocks=cast(vblocks) if vblocks is not None else None,
        cv_mask=cast(cv_mask) if cv_mask is not None else None,
        cv_vals=cast(cv_vals) if cv_vals is not None else None,
        contact=contact_data,
        contact_static=contact_static,
        state_soa=state_soa,
        fdm=fdm,
        grid=grid,
        sf=sf,
        x_ref=np.asarray(
            fes.x_ref if masters is None else fes.x_ref[masters]
        ),
    )


def _local_offsets(pp1):
    """Local tensor-product dof offsets in conn's lexicographic order
    (axis-0 fastest): l = a0 + pp1[0]*(a1 + pp1[1]*a2)."""
    total = int(np.prod(pp1))
    for l in range(total):
        rem = l
        a = []
        for k in range(len(pp1)):
            a.append(rem % pp1[k])
            rem //= pp1[k]
        yield tuple(a)


def _structured_gather(u, dim, spans, pp1, nc, n_pad):
    """Element-dof gather on a structured patch as static slices of the
    dof grid — XLA's general gather/scatter lowers to a sort + serial
    segment reduce (profiled at ~41 ms per GMRES iteration at 1e5
    elements, 4500x off bandwidth); the tensor-product connectivity
    makes it prod(pp1) overlapping slice reads instead."""
    u_grid = u.T.reshape((dim, *nc[::-1]))
    slabs = []
    for alphas in _local_offsets(pp1):
        idx = (slice(None),) + tuple(
            slice(a, a + s) for a, s in zip(alphas[::-1], spans[::-1])
        )
        slabs.append(u_grid[idx].reshape(dim, -1))
    out = jnp.stack(slabs, 1)  # (dim, nd, n_el_real)
    if n_pad:
        out = jnp.concatenate(
            [out, jnp.zeros((dim, out.shape[1], n_pad), u.dtype)], -1
        )
    return out


def _structured_scatter(res_t, dim, spans, pp1, nc, n_dof, n_pad):
    """Transpose of _structured_gather: overlap-add of prod(pp1) shifted
    slab blocks, written as a PAD-AND-SUM — each local-offset slab is
    zero-padded to the full dof grid and the prod(pp1) same-shaped
    tensors are summed, which XLA fuses into one elementwise kernel
    (measured at 48^3, one chip, r5: 1.54 ms vs 5.45 for the previous
    sequential .at[slice].add chain and 2.75 for the MXU conv variant —
    and exact to the bit, parity 0.0).  Padded elements carry
    exactly-zero contributions (w_detJ = 0) and are dropped."""
    n_real = int(np.prod(spans))
    vals = res_t[..., :n_real] if n_pad else res_t
    out = None
    for l, alphas in enumerate(_local_offsets(pp1)):
        block = vals[:, l, :].reshape((dim, *spans[::-1]))
        pads = [(0, 0)] + [
            (a, n - a - s)
            for a, s, n in zip(alphas[::-1], spans[::-1], nc[::-1])
        ]
        p = jnp.pad(block, pads)
        out = p if out is None else out + p
    return out.reshape(dim, n_dof).T


def _conv_scatter(res_t, dim, spans, pp1, nc, n_dof, n_pad):
    """The structured overlap-add as ONE transposed convolution with a
    delta-tap kernel (channel l = local offset l, axis-0 fastest, the
    _local_offsets order): out[n+a] += res[l(a), n].  RETIRED from the
    step paths in round 5: it runs at the MXU's default bf16-input
    precision (~3e-3 relative) and the pad-and-sum _structured_scatter
    now beats it while being exact (measured 1.54 vs 2.75 ms at 48^3).
    Kept as a reference implementation (tests pin its parity)."""
    from jax import lax

    d = len(spans)
    nd = int(np.prod(pp1))
    n_real = int(np.prod(spans))
    vals = res_t[..., :n_real] if n_pad else res_t
    W = np.zeros((1, nd) + tuple(pp1[::-1]), np.float32)
    for l, alphas in enumerate(_local_offsets(pp1)):
        # transposed conv == correlation with the flipped kernel; the
        # flip of a delta at `a` is a delta at `pp1-1-a`
        W[(0, l) + tuple(p - 1 - a for p, a in zip(pp1[::-1], alphas[::-1]))] = 1.0
    g = vals.reshape((dim, nd) + tuple(spans[::-1]))
    pads = [(p - 1, p - 1) for p in pp1[::-1]]
    dn = ("NCHW", "OIHW", "NCHW") if d == 2 else ("NCDHW", "OIDHW", "NCDHW")
    out = lax.conv_general_dilated(
        g,
        jnp.asarray(W, res_t.dtype),
        window_strides=(1,) * d,
        padding=pads,
        dimension_numbers=dn,
    )
    return out.reshape(dim, n_dof).T


def _merge_dirichlet(pairs):
    out = {}
    for b, d in pairs:
        out.setdefault(b, set()).add(d)
    return out


def _contact_fns_for(prob: Problem):
    return [
        make_contact_fns(prob.dim, cs["n_local"], cs["query"])
        for cs in prob.contact_static
    ]


def initial_carry(prob: Problem, dt: float = 1.0):
    """Zero fields + the first-step explicit acceleration
    a0 = M^{-1}(f - E(0) - S v0 - contact(0)) (GeneralizedAlpha2
    nstate==0 semantics, ode.cpp:38-42).  `dt` only reaches
    rate-dependent hardening terms; at the zero state nothing yields, so
    any positive value is equivalent (the reference evaluates this with
    its dt defaulted to 0 and relies on IEEE inf semantics; a positive dt
    is the traced-code-safe analog)."""
    z = jnp.zeros((prob.n_dof, prob.dim), prob.rhs.dtype)
    a0 = _explicit_accel(prob, z, z, prob.state0, dt)
    dtype = prob.rhs.dtype
    carry = {
        "u": z,
        "v": z,
        "a": a0,
        "state": prob.state0,
        "newton": {
            "norm0": jnp.zeros((), dtype),
            "norm": jnp.zeros((), dtype),
            "iters": jnp.zeros((), jnp.int32),
            "lin_iters": jnp.zeros((), jnp.int32),
            "converged": jnp.asarray(True),
            "finite": jnp.asarray(True),
        },
        "contact": [
            {
                "force": jnp.zeros((prob.dim,), dtype),
                "area": jnp.zeros((), dtype),
                "pressure": jnp.zeros((), dtype),
                "nodal_pressure": jnp.zeros((cs["n_local"],), dtype),
                "res_el": jnp.zeros((*cd["conn"].shape, prob.dim), dtype),
                "proj_unconverged": jnp.zeros((), jnp.int32),
                "proj_res_max": jnp.zeros((), dtype),
            }
            for cd, cs in zip(prob.contact, prob.contact_static)
        ],
    }
    return carry


def _soa_E_residual(mat, dt, dim, n_dof, conn, dN_t, wdet_t, u, state_soa):
    """SoA elastic-force sweep y = E(u) shared by the one-time explicit
    acceleration solve (batch-last, no (e, q, 3, 3) tile-padding — the
    vmapped per-quad path OOMs at 1e5 elements with 56.9x padding)."""
    nd = conn.shape[1]
    w_t = jnp.transpose(u[conn], (2, 1, 0))
    grad = soa.stack2(
        [
            [
                sum(
                    dN_t[n, f_] * w_t[g, n][None, :]
                    for n in range(nd)
                )
                for f_ in range(dim)
            ]
            for g in range(dim)
        ]
    )
    F = soa.add_diag(grad, 1.0)
    P = mat.pk1_soa(F, state_soa, dt)
    rows = []
    for n in range(nd):
        cols = []
        for c in range(dim):
            integ = sum(dN_t[n, dd] * P[c, dd] for dd in range(dim))
            cols.append((wdet_t * integ).sum(0))
        rows.append(jnp.stack(cols, -1))
    res_el = jnp.stack(rows, 1)
    return jnp.zeros((n_dof, dim), u.dtype).at[conn].add(res_el)


def _explicit_accel(prob: Problem, u, v, state, dt):
    mat = prob.material
    dim = prob.dim
    n_dof = prob.n_dof
    I = jnp.eye(dim, dtype=prob.rhs.dtype)
    mat_has_soa = getattr(mat, "has_soa", False) or not mat.has_state
    contact_fns = _contact_fns_for(prob)

    def impl(u, v, state, d):
        conn = d["conn"]
        free = d["free"]
        if mat_has_soa:
            state_soa = state
            if state is not None and not prob.state_soa:
                state_soa = soa.state_to_soa(state)
            dN_t = jnp.transpose(d["dNdX"], (2, 3, 1, 0))
            wdet_t = d["wdet"].T
            E_u = _soa_E_residual(
                mat, dt, dim, n_dof, conn, dN_t, wdet_t, u, state_soa
            )
        else:
            state_aos = state
            if state is not None and prob.state_soa:
                state_aos = soa.state_from_soa(state)

            def elem_residual(u_el, dNdX_e, wdet_e, state_e):
                F = I + jnp.einsum("nc,qnd->qcd", u_el, dNdX_e)
                P_ = jax.vmap(lambda Fq, sq: mat.pk1(Fq, sq, dt))(
                    F, state_e
                )
                return jnp.einsum("q,qnd,qcd->nc", wdet_e, dNdX_e, P_)

            res_el = jax.vmap(elem_residual)(
                u[conn], d["dNdX"], d["wdet"], state_aos
            )
            E_u = jnp.zeros((n_dof, dim), u.dtype).at[conn].add(res_el)
        if d.get("visc_blocks") is not None:
            ve = jnp.einsum("enm,emc->enc", d["visc_blocks"], v[conn])
            E_u = E_u.at[conn].add(ve)
        for cd, fns in zip(d["contact"], contact_fns):
            pp, rp, _ = fns
            pressure, _, _ = pp(u, cd, cd["scene"], cd["penalty"])
            res_c, _, _ = rp(u, cd, pressure)
            E_u = E_u.at[cd["conn"]].add(res_c)
        z = (d["rhs"] - E_u) * free

        def mass_apply(w_flat):
            w = w_flat.reshape(n_dof, dim) * free
            ye = jnp.einsum("enm,emc->enc", d["mass_blocks"], w[conn])
            y = jnp.zeros((n_dof, dim), w.dtype).at[conn].add(ye)
            return (
                y * free + w_flat.reshape(n_dof, dim) * (1 - free)
            ).reshape(-1)

        m_diag = jnp.zeros(n_dof, prob.rhs.dtype).at[conn].add(
            jnp.einsum("enn->en", d["mass_blocks"])
        )
        diag = jnp.repeat(m_diag, dim)
        diag = jnp.where(free.reshape(-1) > 0, diag, 1.0)
        a = pcg(
            mass_apply, z.reshape(-1), diag, rel_tol=1e-8,
            abs_tol=1e-12, max_iter=1000,
        )
        return a.reshape(n_dof, dim) * free

    data = {
        "conn": prob.conn,
        "dNdX": prob.dN_dX,
        "wdet": prob.w_detJ,
        "mass_blocks": prob.mass_blocks,
        "rhs": prob.rhs,
        "free": prob.free,
        "visc_blocks": prob.visc_blocks,
        "contact": prob.contact,
    }
    # jitted with arrays as call-time args (closure constants would be
    # re-embedded and constant-folded at compile time)
    return jax.jit(impl)(u, v, state, data)


def make_step(
    prob: Problem,
    dt: float,
    newton_iters: int = 20,
    solver: str = "dense",
    cg_iters: int = 200,
    chunk: int | None = None,
    residual_impl: str = "auto",
    rel_tol: float = 1e-8,
    abs_tol: float = 1e-12,
    lin_rel_tol: float | None = None,
    lin_abs_tol: float | None = None,
    precond: str = "auto",
    contact_tangent: str = "frozen",
    matvec_dtype: str = "f32",
    gmres_restart: int = 30,
    tangent_storage: str = "auto",
    matvec_impl: str = "auto",
):
    """Fully jitted generalized-alpha step: carry -> carry.

    Newton runs inside lax.while_loop with the reference's stopping
    semantics (LineSearchNewton, newton.cpp:99-202): `newton_iters` is
    the max iteration count; convergence goal max(rel_tol*|r0|,
    abs_tol); 3-point-quadratic line search with a 1e-12 scale-floor
    abort; a 5-iteration best-improvement window; the best iterate is
    returned on non-convergence.  `solver` picks dense LU ("dense") or
    matrix-free Jacobi-preconditioned GMRES ("cg"/"iterative"; the
    operator apply contracts the per-quad material tangent, shared with
    the Jacobi diagonal).

    The step covers the reference's full operator: viscosity
    S (v + fac1 a), traction/body-force rhs, constant-velocity dynamic
    Dirichlet rows, and mortar contact (pressure pass inside every
    residual evaluation; frozen-pressure consistent tangent, exactly the
    reference's per-element FD linearization, mortar_contact.cpp:263-295).

    `contact_tangent` selects the contact linearization:
      - "frozen" (default, reference parity): pass-2 differentiated at
        frozen nodal pressure — Newton converges LINEARLY on engaged
        contact (~100 iterations on a stiff press, can stall).
      - "consistent" (iterative solvers only): the J matvec applies the
        EXACT contact jacobian as a jvp of the full two-pass residual —
        quadratic Newton, typically <10 iterations on the same press.
        Exactness rests on the envelope-theorem gap derivative in
        contact/mortar.py (d gap = n . d qpt at a converged foot
        point), so the jvp never differentiates the projection loop.
        Beyond the reference's capability (FD through the kd-tree query
        is impractical in C++; here it is one linearize).

    `matvec_dtype` ("f32" default, "bf16"; pallas engine only) selects
    the STORAGE dtype of the per-qp tangent C and of the dN/N tables
    streamed by the GMRES matvec kernel — its two dominant HBM streams
    (~41 KB/element/apply at p=2).  All arithmetic stays float32 (bf16
    operands upcast on load), and the residual/assemble sweeps keep
    float32 tables, so Newton residuals are unaffected: bf16 only
    perturbs the Krylov operator by ~4e-3 relative, equivalent to a
    slightly more inexact Newton forcing.  Use with lin_rel_tol >=
    1e-3.

    `matvec_impl` ("auto" default, "dense", "sf"; pallas engine): "sf"
    streams the tensor-product FACTORS of the basis (per-element 1D
    tables + per-qp dxi/dX, Problem.sf) instead of the dense dN/N in
    the GMRES matvec — measured 3.99 ms vs 4.85 ms (dense bf16) per
    apply at 48^3 with exact f32 streams (docs/ROADMAP.md lever 4).
    "auto" uses it whenever the problem carries the factors (single 3D
    polynomial patch, tensor quadrature).

    `gmres_restart` (default 30) is the Arnoldi restart length of the
    iterative solves (clamped to cg_iters).  Larger restarts preserve
    superlinear convergence on contact-stiff tangents at the cost of
    O(restart) stored Krylov vectors.

    `tangent_storage` ("auto" default, "full", "sym", "cauchy"; pallas
    engine): "sym" stores the per-qp tangent as its 45 upper-triangle
    planes (vs 81), cutting the matvec kernel's dominant HBM stream
    1.8x — exact only for materials whose dP/dF has major symmetry
    (`Material.tangent_major_symmetric` — the hyperelastic energy
    Hessians; measured round 4: NeoHookean/StVK symmetric to 3e-16,
    the J2 family asymmetric by 2-16% through the Cauchy->PK1
    geometric terms, docs/ROADMAP.md).  "cauchy" (VERDICT r4 #3)
    stores the 37-plane decomposition block instead — the Voigt
    material tangent M = d sigma/d eps (21 tri planes) + sigma + F^-1
    + J (ops/sweeps.py cauchy_plane_layout) — and applies the exact
    geometric transform dP = tr(F^-1 dF) P + J (M:sym dF) F^-T
    - P dF^T F^-T per-qp inside the matvec kernel: a 2.2x stream cut
    that IS exact for the small-strain J2 family
    (`Material.tangent_cauchy_decomp`), recovering the compression the
    measured dP/dF asymmetry denied them.  "auto" picks the strongest
    exact compression the material declares (cauchy > sym > full) on
    the pallas engine.

    `residual_impl` selects the assembly engine:
      - "auto" (default): the SoA batch-last engine ("soa") when the
        material implements the SoA fast path (materials.has_soa) and
        the solver is iterative; otherwise the einsum engine ("xla").
      - "soa": structure-of-arrays hot path (fem/soa.py) — every
        intermediate keeps the (n_el, n_q) quadrature batch in the
        minor-most (tiled) dims; the element tangent comes from
        jax.linearize with 9 one-hot seeds (no jacfwd lane padding);
        mass/viscosity/stiffness fuse into single quadrature sweeps.
      - "xla": the original batch-first einsum engine (any material).
      - "pallas": fused VMEM kernels (ops/pallas_residual.py) for the
        line-search residuals and the GMRES matvec.  Requires a
        neo-Hookean material and a float32 problem; single-chip, no
        contact.  Off TPU it runs in interpret mode (correctness-only).

    `lin_rel_tol`/`lin_abs_tol` set the inner (GMRES/CG) stopping
    tolerances.  Defaults: 1e-8/1e-12 in float64; 3e-6/1e-12 in float32,
    where 1e-8 is below machine epsilon and would burn the full
    iteration budget on every solve (inexact-Newton forcing).

    All large arrays enter the compiled function as ARGUMENTS —
    embedding them as closure constants makes XLA constant-fold
    mesh-sized dots at compile time (observed: compile time exploding
    with element count).  The returned callable is already jitted; do
    not re-wrap it in jax.jit (that would re-embed the arrays as
    constants).

    The returned `step(carry, contact_scenes=None)` optionally takes
    fresh per-block scene data (a list matching prob.contact) so rigid
    tools can move between steps without re-tracing.
    """
    mat = prob.material
    dim = prob.dim
    n_dof = prob.n_dof
    f = prob.facs
    I = jnp.eye(dim, dtype=prob.rhs.dtype)
    dt = float(dt)
    fac0 = f["fac3"] * dt * dt
    fac1 = f["fac4"] * dt
    iterative = solver in ("cg", "iterative", "gmres")
    max_iter = int(newton_iters)
    if chunk is not None and prob.n_el % chunk != 0:
        raise ValueError(
            f"chunk ({chunk}) must divide the padded element count "
            f"({prob.n_el}); pass pad_multiple to build_problem"
        )
    has_visc = prob.visc_blocks is not None
    has_cv = prob.cv_mask is not None
    contact_fns = _contact_fns_for(prob)
    has_contact = bool(contact_fns)

    if contact_tangent not in ("frozen", "consistent"):
        raise ValueError(f"unknown contact_tangent {contact_tangent!r}")
    consistent_ct = contact_tangent == "consistent" and has_contact
    if consistent_ct and not iterative:
        raise ValueError(
            "contact_tangent='consistent' needs an iterative solver "
            "(the exact contact jacobian is matrix-free; the dense path "
            "assembles frozen-pressure element blocks)"
        )

    mat_has_soa = getattr(mat, "has_soa", False) or not mat.has_state
    if residual_impl == "auto":
        residual_impl = "soa" if (mat_has_soa and iterative) else "xla"
    use_pallas = residual_impl == "pallas"
    use_soa = residual_impl in ("soa", "pallas")
    if use_soa:
        if not iterative:
            raise ValueError(
                f"residual_impl={residual_impl!r} requires an iterative "
                "solver (the dense path assembles the matrix batch-first)"
            )
        if not mat_has_soa:
            raise ValueError(
                f"{mat.name()} has no SoA fast path; use "
                "residual_impl='xla'"
            )
    if use_pallas and prob.rhs.dtype != jnp.float32:
        raise ValueError(
            "residual_impl='pallas' requires a float32 problem"
        )
    if matvec_dtype not in ("f32", "bf16"):
        raise ValueError(f"unknown matvec_dtype {matvec_dtype!r}")
    if tangent_storage not in ("auto", "full", "sym", "cauchy"):
        raise ValueError(f"unknown tangent_storage {tangent_storage!r}")
    mat_sym = bool(getattr(prob.material, "tangent_major_symmetric", False))
    mat_cauchy = bool(
        getattr(prob.material, "tangent_cauchy_decomp", False)
    )
    if tangent_storage in ("sym", "cauchy") and not use_pallas:
        raise ValueError(
            f"tangent_storage={tangent_storage!r} is implemented for "
            "the pallas engine"
        )
    if tangent_storage == "sym" and not mat_sym:
        raise ValueError(
            f"{type(prob.material).__name__} does not declare a "
            "major-symmetric dP/dF (tangent_major_symmetric); "
            "symmetric tangent storage would silently corrupt the "
            "Krylov operator (measured 2-16% asymmetry for the J2 "
            "family, docs/ROADMAP.md)"
        )
    if tangent_storage == "cauchy" and not mat_cauchy:
        raise ValueError(
            f"{type(prob.material).__name__} does not declare the "
            "Cauchy-decomposition contract (tangent_cauchy_decomp: "
            "sigma symmetric and a function of sym(F) only) — the "
            "37-plane storage would silently corrupt the Krylov "
            "operator"
        )
    if tangent_storage == "auto" and use_pallas:
        # prefer the strongest exact compression the material declares:
        # cauchy (37 planes, small-strain J2 family) > sym (45 planes,
        # hyperelastic Hessians) > full (81)
        c_storage = (
            "cauchy" if mat_cauchy else ("sym" if mat_sym else "full")
        )
    else:
        c_storage = tangent_storage if tangent_storage != "auto" else "full"
    if matvec_dtype == "bf16" and not use_pallas:
        raise ValueError(
            "matvec_dtype='bf16' is implemented for the pallas engine"
        )
    mv_bf16 = matvec_dtype == "bf16"
    if matvec_impl not in ("auto", "dense", "sf"):
        raise ValueError(f"unknown matvec_impl {matvec_impl!r}")
    if matvec_impl == "sf" and (not use_pallas or prob.sf is None):
        raise ValueError(
            "matvec_impl='sf' needs the pallas engine and a problem "
            "with sum-factorization tables (Problem.sf: single 3D "
            "polynomial patch, tensor quadrature)"
        )
    # "auto": the sum-factorized matvec whenever the factors exist —
    # measured faster than the dense kernel at every scale tried, with
    # exact f32 table streams (docs/ROADMAP.md lever 4)
    use_sf = use_pallas and (
        matvec_impl == "sf"
        or (matvec_impl == "auto" and prob.sf is not None)
    )
    if lin_rel_tol is None:
        lin_rel_tol = 1e-8 if prob.rhs.dtype == jnp.float64 else 3e-6
    if lin_abs_tol is None:
        lin_abs_tol = 1e-12

    # inner-solve preconditioner: tensor-product fast diagonalization
    # (solvers/fdm.py, h-independent GMRES counts) when the patch/BCs
    # factorize and no contact perturbs the spectrum; per-control-point
    # block-Jacobi otherwise
    if precond == "auto":
        # FDM covers contact problems too: the penalty folds into the
        # face-normal 1D stiffness as a boundary spring (solvers/fdm.py)
        precond = (
            "fdm" if (use_soa and prob.fdm is not None) else "bj"
        )
    if precond == "fdm":
        if prob.fdm is None:
            raise ValueError(
                "precond='fdm' requested but the problem has no "
                "tensor-product decomposition (Problem.fdm is None)"
            )
        fdm_apply = make_fdm_apply(prob.fdm, fac0, fac1, prob.rhs.dtype)
    elif precond == "schur":
        # FDM + additive contact face-block correction (solvers/fdm.py
        # build_contact_face_schur): the exact mortar double-average
        # block on the contact face's normal component, dense-inverted
        # once at build.  Targets the measured ~30-its/solve contact
        # plateau the separable spring cannot cut (VERDICT r3 next #2).
        if prob.fdm is None:
            raise ValueError(
                "precond='schur' requested but the problem has no "
                "tensor-product decomposition (Problem.fdm is None)"
            )
        from ..solvers.fdm import (
            build_contact_face_schur,
            make_fdm_schur_apply,
        )

        schur = build_contact_face_schur(prob.fdm, fac0, fac1)
        if schur is None:
            raise ValueError(
                "precond='schur' requested but the problem has no "
                "axis-aligned contact face to correct (use 'fdm')"
            )
        fdm_apply = make_fdm_schur_apply(
            prob.fdm, schur, fac0, fac1, prob.rhs.dtype
        )
        precond = "fdm"  # downstream: same apply slot
    elif precond != "bj":
        raise ValueError(f"unknown precond {precond!r}")

    if use_pallas:
        from ..ops import sweeps as _sweeps

        _interpret = jax.default_backend() != "tpu"
        _sw_args = dict(
            mat=mat,
            dt=dt,
            dim=dim,
            nd=int(prob.conn.shape[1]),
            n_q=prob.n_q,
            n_el=prob.n_el,
            rho=float(mat.density),
            mu_v=float(mat.viscosity) if has_visc else 0.0,
            has_visc=has_visc,
            state=prob.state0,
            interpret=_interpret,
        )
        # per-kernel VMEM budgets: the assemble's linearize replay holds
        # the most live planes, the matvec adds the (81, q, be) C block
        _sf_kw = (
            dict(sf_mode=True, n_g=prob.sf["n_g"], pp1=prob.sf["pp1"])
            if use_sf
            else {}
        )
        _res_sweep = _sweeps.make_residual_sweep(
            **_sw_args, block_e=_sweeps.pick_block_e(prob.n_el, 128),
            **_sf_kw,
        )
        _asm_sweep = _sweeps.make_assemble_sweep(
            **_sw_args,
            block_e=_sweeps.pick_block_e(prob.n_el, 128),
            c_dtype=jnp.bfloat16 if mv_bf16 else jnp.float32,
            c_storage=c_storage,
            **_sf_kw,
        )
        _mv_kw = dict(
            dim=dim,
            nd=int(prob.conn.shape[1]),
            n_q=prob.n_q,
            n_el=prob.n_el,
            rho=float(mat.density),
            fac0=fac0,
            fac1_mu_v=fac1 * (float(mat.viscosity) if has_visc else 0.0),
            has_visc=has_visc,
            block_e=_sweeps.pick_block_e(prob.n_el, 128),
            interpret=_interpret,
            c_storage=c_storage,
        )
        if use_sf:
            # sum-factorized matvec (measured r5: 3.99 ms f32 vs 4.85
            # dense bf16 at 48^3, exact f32 table streams — the dn/nn
            # streams shrink ~9x and the bf16 Krylov perturbation of
            # the dense path disappears; docs/ROADMAP.md lever 4)
            _mv_sweep = _sweeps.make_matvec_sweep_sf(
                **_mv_kw, n_g=prob.sf["n_g"], pp1=prob.sf["pp1"]
            )
        else:
            _mv_sweep = _sweeps.make_matvec_sweep(**_mv_kw)
    elif residual_impl not in ("xla", "soa"):
        raise ValueError(f"unknown residual_impl {residual_impl!r}")

    # device-put exactly what the selected engine consumes: the Problem
    # keeps tables host-side, and holding both the batch-first and
    # (q, e) layouts on device exhausts HBM at the 1e5-element scale
    def dput(a):
        # leave device arrays (possibly sharded by shard_problem) alone
        if isinstance(a, jax.Array):
            return a
        return jax.device_put(jnp.asarray(a))
    data = {
        "rhs": dput(prob.rhs),
        "free": dput(prob.free),
        "contact": prob.contact,
    }
    if has_cv:
        data["cv_mask"] = dput(prob.cv_mask)
        data["cv_vals"] = dput(prob.cv_vals)
    if not use_soa or not iterative:
        # batch-first engines (xla einsum / dense)
        data["conn"] = dput(prob.conn)
        data["dNdX"] = dput(prob.dN_dX)
        data["wdet"] = dput(prob.w_detJ)
        data["mass_blocks"] = dput(prob.mass_blocks)
        if has_visc:
            data["visc_blocks"] = dput(prob.visc_blocks)
    elif has_visc:
        data["visc_blocks"] = dput(prob.visc_blocks)
    if use_soa:
        # batch-last tables in (q, e) order — elements on lanes, quads on
        # sublanes: zero tile padding and per-element scalars broadcast
        # along sublanes (see fem/soa.py state_to_soa)
        _multi_dev = (
            isinstance(prob.dN_dX, jax.Array)
            and len(prob.dN_dX.sharding.device_set) > 1
        )
        if _multi_dev:
            # sharded problem: transposes propagate the sharding (the
            # element axis moves to the batch-last position)
            data["dN_t"] = jnp.transpose(prob.dN_dX, (2, 3, 1, 0))
            data["N_t"] = jnp.transpose(prob.N, (2, 1, 0))
            data["wdet_t"] = prob.w_detJ.T
            data["connT"] = prob.conn.T
        else:
            data["dN_t"] = dput(
                np.transpose(prob.dN_dX, (2, 3, 1, 0)).copy()
            )
            data["N_t"] = dput(np.transpose(prob.N, (2, 1, 0)).copy())
            data["wdet_t"] = dput(np.ascontiguousarray(prob.w_detJ.T))
            # transposed connectivity for layout-friendly gather/scatter:
            # indexing the (dim, n_dof) transposed dof vector with
            # (nd, e) keeps the minor dims large (the (e, nd, dim)
            # scatter fused into a ~12 ms/GMRES-iteration monster at 32k)
            data["connT"] = dput(np.ascontiguousarray(prob.conn.T))
        if use_sf:
            # sum-factorized matvec streams: 1D basis factors + per-qp
            # dxi/dX instead of the dense dN/N (kept f32 — measured
            # identical speed to bf16 factors, and exact)
            data["sf_tabs"] = [dput(t) for t in prob.sf["tables"]]
            data["sf_jinv"] = dput(prob.sf["jinv"])
        elif use_pallas and mv_bf16:
            # half-width copies of the matvec kernel's table streams
            # (the kernel upcasts on load; f32 tables stay for the
            # residual/assemble sweeps)
            data["dN_mv"] = data["dN_t"].astype(jnp.bfloat16)
            data["N_mv"] = data["N_t"].astype(jnp.bfloat16)
    if use_soa and precond == "bj":
        # static block-Jacobi: M + fac1 S + fac0 K_elastic per-node
        # (dim x dim) blocks.  The geometry is total-Lagrangian (dN/dX,
        # w detJ constant), so the elastic surrogate of the consistent
        # tangent gives a Newton-iteration-independent preconditioner —
        # built once here instead of per assemble.  C_el[cdgf] =
        # lam d_cd d_gf + mu (d_cg d_df + d_cf d_dg)  =>
        # node block = fac0 [(lam+mu) A + mu tr(A) I] + (m + fac1 s) I,
        # A[c,g] = sum_q w dN_c dN_g (symmetric).
        lam_s = max(float(mat.lambda_), 0.0)
        mu_s = max(float(mat.mu), 0.0)
        A_el = np.einsum(
            "eq,eqnc,eqng->encg",
            prob.w_detJ,
            prob.dN_dX,
            prob.dN_dX,
            optimize=True,
        )
        eye_d = np.eye(dim, dtype=prob.rhs.dtype)
        kb_el = (lam_s + mu_s) * A_el + mu_s * np.einsum(
            "encc->en", A_el
        )[..., None, None] * eye_d
        nblocks = np.zeros((n_dof, dim, dim), prob.rhs.dtype)
        np.add.at(nblocks, prob.conn, kb_el)
        nblocks *= fac0
        m_diag_s = np.zeros(n_dof, prob.rhs.dtype)
        np.add.at(
            m_diag_s, prob.conn, np.einsum("enn->en", prob.mass_blocks)
        )
        nblocks = nblocks + m_diag_s[:, None, None] * eye_d
        if has_visc:
            s_diag_s = np.zeros(n_dof, prob.rhs.dtype)
            np.add.at(
                s_diag_s,
                prob.conn,
                np.einsum("enn->en", prob.visc_blocks),
            )
            nblocks = nblocks + fac1 * s_diag_s[:, None, None] * eye_d
        data["bj_nblocks"] = dput(nblocks)
        data["bj_inv_static"] = block_jacobi_inverse(
            dput(nblocks), dput(prob.free)
        )

    def pk1_and_tangent(Fq, state_q):
        def fn(Fx):
            P = mat.pk1(Fx, state_q, dt)
            return P, P

        C, P = jax.jacfwd(fn, has_aux=True)(Fq)
        return P, C

    def impl(carry, d, mode="full"):
        # mode (static): "full" = one generalized-alpha step;
        # "fp_solve"/"fp_commit" = the FSI fixed-point split
        # (FixedPointSolve2 / AdvanceTime2, ode.cpp:81-187) — same
        # closures, the session drives predict/preview host-side.
        # batch-first tables are only present for the xla/dense engines
        conn = d.get("conn")
        dNdX = d.get("dNdX")
        wdet = d.get("wdet")
        mass_blocks = d.get("mass_blocks")
        rhs = d["rhs"]
        free = d["free"]
        cdata = d["contact"]

        def E(u, state):
            F = I + jnp.einsum("enc,eqnd->eqcd", u[conn], dNdX)
            P = jax.vmap(
                jax.vmap(lambda Fq, sq: mat.pk1(Fq, sq, dt))
            )(F, state)
            res_el = jnp.einsum("eq,eqnd,eqcd->enc", wdet, dNdX, P)
            return (
                jnp.zeros((n_dof, dim), u.dtype).at[conn].add(res_el)
            )

        def mass_apply(u):
            ye = jnp.einsum("enm,emc->enc", mass_blocks, u[conn])
            return jnp.zeros((n_dof, dim), u.dtype).at[conn].add(ye)

        if has_visc:

            def visc_apply(u):
                ye = jnp.einsum("enm,emc->enc", d["visc_blocks"], u[conn])
                return (
                    jnp.zeros((n_dof, dim), u.dtype).at[conn].add(ye)
                )

        def contact_residual(u_cur):
            """Full two-pass contact at current coords (pressure pass
            incl. closest-point queries + traction assembly)."""
            out = jnp.zeros((n_dof, dim), u_cur.dtype)
            for cd, (pp, rp, _) in zip(cdata, contact_fns):
                pressure, _, _ = pp(u_cur, cd, cd["scene"], cd["penalty"])
                res_el, _, _ = rp(u_cur, cd, pressure)
                out = out.at[cd["conn"]].add(res_el)
            return out

        def contact_assemble(u_cur):
            """Pressure pass + residual + frozen-pressure element blocks
            per contact block; returns (residual, [blocks], [aux])."""
            out = jnp.zeros((n_dof, dim), u_cur.dtype)
            blocks_l, aux_l = [], []
            for cd, (pp, _, rgp) in zip(cdata, contact_fns):
                pressure, area, qdiag = pp(u_cur, cd, cd["scene"], cd["penalty"])
                res_el, blocks, force, pint = rgp(u_cur, cd, pressure)
                out = out.at[cd["conn"]].add(res_el)
                blocks_l.append(blocks)
                aux_l.append(
                    {"force": force, "area": area, "pressure": pint}
                )
            return out, blocks_l, aux_l

        def contact_finish(r, ctx, u_eval):
            """Shared assemble tail: add the contact residual and stash
            the tangent context.  contact_tangent="consistent" records
            the evaluation state for the solve's exact jvp (frozen
            element blocks are then only built when the block-Jacobi
            preconditioner needs node blocks)."""
            if consistent_ct and precond != "bj":
                r = r + contact_residual(u_eval)
                ctx["c_ueval"] = u_eval
                return r, ctx, None
            rc_, blocks_l, _aux = contact_assemble(u_eval)
            r = r + rc_
            ctx["cblocks"] = blocks_l
            if consistent_ct:
                ctx["c_ueval"] = u_eval
            return r, ctx, blocks_l

        def make_contact_tan(ctx):
            """The J-matvec contact term for the iterative solvers."""
            if consistent_ct:
                _, c_jvp = jax.linearize(
                    contact_residual, ctx["c_ueval"]
                )
                return c_jvp
            return lambda w: contact_block_apply(ctx["cblocks"], w)

        d2 = dim * dim
        n_el, n_q = prob.n_el, prob.n_q

        if use_soa:
            # ---- structure-of-arrays engine (fem/soa.py layout) ----
            # every intermediate is a (n_q, n_el) plane — elements on
            # lanes, quads on sublanes, zero tile padding; the d/nd
            # loops unroll into fused VPU code.
            dN_t = d["dN_t"]  # (nd, dim, n_q, n_el)
            N_t = d["N_t"]  # (nd, n_q, n_el)
            wdet_t = d["wdet_t"]  # (n_q, n_el)
            # matvec table streams (bf16 copies when matvec_dtype="bf16")
            dN_mv = d.get("dN_mv", dN_t)
            N_mv = d.get("N_mv", N_t)
            sf_tabs = d.get("sf_tabs")
            sf_jinv = d.get("sf_jinv")
            nd_s = int(prob.conn.shape[1])
            rho_s = mat.density
            mu_v = mat.viscosity if has_visc else 0.0
            I_soa = jnp.eye(dim, dtype=rhs.dtype).reshape(
                dim, dim, 1, 1
            )

            # structured (slice-based) dof mapping when the patch grid
            # is available and unsharded; general transposed-conn
            # gather/scatter otherwise
            structured = (
                prob.grid is not None
                and not isinstance(prob.dN_dX, jax.Array)
            )
            if structured:
                _g = prob.grid
                _n_pad = prob.n_el - int(np.prod(_g["spans"]))

                def gather_t(u):
                    return _structured_gather(
                        u, dim, _g["spans"], _g["pp1"], _g["nc"], _n_pad
                    )

            else:
                connT = d["connT"]  # (nd, n_el)

                def gather_t(u):
                    # (n_dof, dim) -> (dim, nd, n_el) via the
                    # transposed dof vector (minor dims stay large)
                    return u.T[:, connT]

            def grad_interp(w_t):
                # dF[g,f](q,e) = sum_n w_t[g,n](e) dN_t[n,f](q,e)
                return soa.stack2(
                    [
                        [
                            sum(
                                w_t[g, n][None, :] * dN_t[n, f_]
                                for n in range(nd_s)
                            )
                            for f_ in range(dim)
                        ]
                        for g in range(dim)
                    ]
                )

            def value_interp(w_t):
                # uq[c](q,e) = sum_n w_t[c,n](e) N_t[n](q,e)
                return jnp.stack(
                    [
                        sum(
                            w_t[c, n][None, :] * N_t[n]
                            for n in range(nd_s)
                        )
                        for c in range(dim)
                    ]
                )

            if structured:

                def scatter_el(res_t):
                    return _structured_scatter(
                        res_t, dim, _g["spans"], _g["pp1"], _g["nc"],
                        n_dof, _n_pad,
                    )

            else:

                def scatter_el(res_t):
                    # (dim, nd, n_el) element values -> (n_dof, dim)
                    # via the transposed accumulator
                    out_t = (
                        jnp.zeros((dim, n_dof), res_t.dtype)
                        .at[:, connT]
                        .add(res_t)
                    )
                    return out_t.T

            def scatter_qp(P_eff, vec=None):
                # y[c,n](e) = sum_q wdet (sum_d dN_t[n,d] P_eff[c,d]
                #                         + N_t[n] vec[c])
                rows = []
                for c in range(dim):
                    cols_n = []
                    for n in range(nd_s):
                        integ = sum(
                            dN_t[n, dd] * P_eff[c, dd]
                            for dd in range(dim)
                        )
                        if vec is not None:
                            integ = integ + N_t[n] * vec[c]
                        cols_n.append((wdet_t * integ).sum(0))
                    rows.append(jnp.stack(cols_n, 0))  # (nd, e)
                res_t = jnp.stack(rows, 0)  # (dim, nd, e)
                return scatter_el(res_t)

            def visc_add(P, aa, va):
                # S (v + fac1 a) as a diffusion flux fused into the
                # same quadrature sweep
                if not has_visc:
                    return P
                dV = grad_interp(gather_t(va + fac1 * aa))
                return P + mu_v * dV

            if use_pallas:

                def residual(aa, xa, va, state):
                    u_el = gather_t(xa + fac0 * aa)
                    a_el = gather_t(aa * free)
                    v_el = (
                        gather_t(va + fac1 * aa) if has_visc else None
                    )
                    if use_sf:
                        res_t = _res_sweep(
                            u_el, a_el, v_el, state, *sf_tabs,
                            sf_jinv, wdet_t,
                        )
                    else:
                        res_t = _res_sweep(
                            u_el, a_el, v_el, state, dN_t, N_t, wdet_t
                        )
                    y = scatter_el(res_t)
                    if has_contact:
                        y = y + contact_residual(xa + fac0 * aa)
                    return (y - rhs) * free

            else:

                def residual(aa, xa, va, state):
                    x_t = gather_t(xa + fac0 * aa)
                    F = I_soa + grad_interp(x_t)
                    P = mat.pk1_soa(F, state, dt)
                    P = visc_add(P, aa, va)
                    vecm = rho_s * value_interp(gather_t(aa * free))
                    y = scatter_qp(P, vecm)
                    if has_contact:
                        y = y + contact_residual(xa + fac0 * aa)
                    return (y - rhs) * free

        else:

            def residual(aa, xa, va, state):
                temp_x = xa + fac0 * aa
                y = mass_apply(aa * free) + E(temp_x, state)
                if has_visc:
                    y = y + visc_apply(va + fac1 * aa)
                if has_contact:
                    y = y + contact_residual(temp_x)
                return (y - rhs) * free

        def assemble_PC_t(aa, xa, state):
            """Residual + material tangent, tangent returned batch-last
            (d2, d2, n_el*n_q).  With `chunk` set, runs as lax.map over
            element blocks so the jacfwd intermediates (whose tiny minor
            dims XLA lane-pads ~19x) stay chunk-sized."""
            temp_x = xa + fac0 * aa

            def block(args):
                conn_c, dN_c, w_c, st_c = args
                F = I + jnp.einsum(
                    "enc,eqnd->eqcd", temp_x[conn_c], dN_c
                )
                P, C = jax.vmap(jax.vmap(pk1_and_tangent))(F, st_c)
                res_el = jnp.einsum("eq,eqnd,eqcd->enc", w_c, dN_c, P)
                n_e_c = w_c.shape[0]
                Ct = C.reshape(n_e_c * n_q, d2, d2).transpose(1, 2, 0)
                return res_el, Ct

            if chunk is None:
                res_el, Ct = block((conn, dNdX, wdet, state))
                rE = (
                    jnp.zeros((n_dof, dim), aa.dtype)
                    .at[conn]
                    .add(res_el)
                )
                return rE, Ct
            n_chunks = n_el // chunk

            def resh(a):
                return a.reshape(n_chunks, chunk, *a.shape[1:])

            args = (
                resh(conn),
                resh(dNdX),
                resh(wdet),
                jax.tree.map(resh, state),
            )
            res_els, Cts = jax.lax.map(block, args)
            rE = (
                jnp.zeros((n_dof, dim), aa.dtype)
                .at[conn]
                .add(res_els.reshape(n_el, -1, dim))
            )
            # (n_chunks, d2, d2, chunk*n_q) -> (d2, d2, n_el*n_q)
            Ct = jnp.moveaxis(Cts, 0, 2).reshape(d2, d2, n_el * n_q)
            return rE, Ct

        free_flat = free.reshape(-1)

        def contact_block_apply(blocks_l, w):
            """Frozen-pressure contact tangent as an element-block
            matvec (blocks from contact_assemble)."""
            y = jnp.zeros((n_dof, dim), w.dtype)
            for cd, blocks in zip(cdata, blocks_l):
                n_mb, nd = cd["conn"].shape
                w_el = w[cd["conn"]].reshape(n_mb, nd * dim)
                y_el = jnp.einsum("eab,eb->ea", blocks, w_el)
                y = y.at[cd["conn"]].add(y_el.reshape(n_mb, nd, dim))
            return y

        def contact_node_blocks(blocks_l):
            """Per-node (dim x dim) diagonal blocks of the contact
            tangent, for the block-Jacobi preconditioner."""
            y = jnp.zeros((n_dof, dim, dim), rhs.dtype)
            for cd, blocks in zip(cdata, blocks_l):
                n_mb, nd = cd["conn"].shape
                B = blocks.reshape(n_mb, nd, dim, nd, dim)
                # diagonal over the (node, node) axes
                de = jnp.moveaxis(
                    jnp.diagonal(B, axis1=1, axis2=3), 3, 1
                )  # (n_mb, nd, dim, dim)
                y = y.at[cd["conn"]].add(de)
            return y

        # ---------------- newton machinery ----------------
        def make_newton(xa, va, state):
            def res_fn(aa):
                return residual(aa, xa, va, state)

            if use_pallas:
                # fused VMEM sweeps (ops/sweeps.py): assemble emits the
                # residual and the per-qp tangent C in one kernel; the
                # matvec kernel fuses mass + viscosity + fac0*C:dF.
                def _ctx_finish(r, ctx, aa):
                    if has_contact:
                        r, ctx, blocks_l = contact_finish(
                            r, ctx, xa + fac0 * aa
                        )
                        if precond == "bj":
                            nb = d["bj_nblocks"] + fac0 * (
                                contact_node_blocks(blocks_l)
                            )
                            ctx["bj_inv"] = block_jacobi_inverse(
                                nb, free
                            )
                    elif precond == "bj":
                        ctx["bj_inv"] = d["bj_inv_static"]
                    return (r - rhs) * free, ctx

                def assemble_fn(aa):
                    u_el = gather_t(xa + fac0 * aa)
                    a_el = gather_t(aa * free)
                    v_el = (
                        gather_t(va + fac1 * aa) if has_visc else None
                    )
                    if use_sf:
                        res_t, Ck = _asm_sweep(
                            u_el, a_el, v_el, state, *sf_tabs,
                            sf_jinv, wdet_t,
                        )
                    else:
                        res_t, Ck = _asm_sweep(
                            u_el, a_el, v_el, state, dN_t, N_t, wdet_t
                        )
                    r = scatter_el(res_t)
                    return _ctx_finish(r, {"Ck": Ck}, aa)

                # matvec-path scatter: _structured_scatter's pad-and-sum
                # is now both the fastest AND exact (measured r5: 1.54 ms
                # vs 2.75 for the bf16-gated MXU conv it retires), so
                # every path shares it
                scatter_mv = scatter_el

                def solve_fn(ctx, r):
                    Ck = ctx["Ck"]
                    c_tan = make_contact_tan(ctx) if has_contact else None

                    def J_apply(w_flat):
                        w = w_flat.reshape(n_dof, dim) * free
                        if use_sf:
                            y_t = _mv_sweep(
                                gather_t(w), *sf_tabs, sf_jinv,
                                wdet_t, Ck,
                            )
                        else:
                            y_t = _mv_sweep(
                                gather_t(w), dN_mv, N_mv, wdet_t, Ck
                            )
                        y = scatter_mv(y_t)
                        if has_contact:
                            y = y + fac0 * c_tan(w)
                        return (
                            y * free
                            + w_flat.reshape(n_dof, dim) * (1 - free)
                        ).reshape(-1)

                    if precond == "fdm":
                        M_apply = fdm_apply
                    else:
                        bj = ctx["bj_inv"]
                        M_apply = lambda v: block_jacobi_apply(bj, v)
                    c, li = gmres(
                        J_apply,
                        r.reshape(-1),
                        M_apply=M_apply,
                        rel_tol=lin_rel_tol,
                        abs_tol=lin_abs_tol,
                        restart=min(gmres_restart, cg_iters),
                        max_iter=cg_iters,
                        return_info=True,
                    )
                    return c.reshape(n_dof, dim), li["iters"]

            elif use_soa:
                # residual + material tangent via jax.linearize with 9
                # one-hot seeds: the tangent C[c,d,g,f](e,q) stays
                # batch-last (no jacfwd lane padding), and the matvec
                # fuses mass + viscosity + fac0*K into one sweep.
                def assemble_fn(aa):
                    x_t = gather_t(xa + fac0 * aa)
                    F = I_soa + grad_interp(x_t)
                    P_lin, jvp_fn = jax.linearize(
                        lambda Ft: mat.pk1_soa(Ft, state, dt), F
                    )
                    cols = []
                    for g in range(dim):
                        for f_ in range(dim):
                            seed = (
                                jnp.zeros((dim, dim, 1, 1), F.dtype)
                                .at[g, f_]
                                .set(1.0)
                            )
                            cols.append(
                                jvp_fn(jnp.broadcast_to(seed, F.shape))
                            )
                    C = jnp.stack(cols).reshape(
                        dim, dim, dim, dim, n_q, n_el
                    )  # (g, f, c, d, q, e)
                    C = jnp.transpose(C, (2, 3, 0, 1, 4, 5))
                    P_eff = visc_add(P_lin, aa, va)
                    vecm = rho_s * value_interp(gather_t(aa * free))
                    r = scatter_qp(P_eff, vecm)
                    ctx = {"C": C}
                    if has_contact:
                        r, ctx, blocks_l = contact_finish(
                            r, ctx, xa + fac0 * aa
                        )
                        if precond == "bj":
                            nb = d["bj_nblocks"] + fac0 * (
                                contact_node_blocks(blocks_l)
                            )
                            ctx["bj_inv"] = block_jacobi_inverse(
                                nb, free
                            )
                    elif precond == "bj":
                        ctx["bj_inv"] = d["bj_inv_static"]
                    r = (r - rhs) * free
                    return r, ctx

                def solve_fn(ctx, r):
                    C = ctx["C"]
                    c_tan = make_contact_tan(ctx) if has_contact else None

                    def J_apply(w_flat):
                        w = w_flat.reshape(n_dof, dim) * free
                        w_t = gather_t(w)
                        dF = grad_interp(w_t)
                        dP = soa.stack2(
                            [
                                [
                                    fac0
                                    * sum(
                                        C[c, dd, g, f_] * dF[g, f_]
                                        for g in range(dim)
                                        for f_ in range(dim)
                                    )
                                    + (
                                        (fac1 * mu_v) * dF[c, dd]
                                        if has_visc
                                        else 0.0
                                    )
                                    for dd in range(dim)
                                ]
                                for c in range(dim)
                            ]
                        )
                        vec = rho_s * value_interp(w_t)
                        y = scatter_qp(dP, vec)
                        if has_contact:
                            y = y + fac0 * c_tan(w)
                        return (
                            y * free
                            + w_flat.reshape(n_dof, dim) * (1 - free)
                        ).reshape(-1)

                    if precond == "fdm":
                        M_apply = fdm_apply
                    else:
                        bj = ctx["bj_inv"]
                        M_apply = lambda v: block_jacobi_apply(bj, v)
                    c, li = gmres(
                        J_apply,
                        r.reshape(-1),
                        M_apply=M_apply,
                        rel_tol=lin_rel_tol,
                        abs_tol=lin_abs_tol,
                        restart=min(gmres_restart, cg_iters),
                        max_iter=cg_iters,
                        return_info=True,
                    )
                    return c.reshape(n_dof, dim), li["iters"]

            elif iterative:
                m_diag = jnp.zeros(n_dof, rhs.dtype).at[conn].add(
                    jnp.einsum("enn->en", mass_blocks)
                )
                if has_visc:
                    s_diag = jnp.zeros(n_dof, rhs.dtype).at[conn].add(
                        jnp.einsum("enn->en", d["visc_blocks"])
                    )

                def assemble_fn(aa):
                    rE, Ct = assemble_PC_t(aa, xa, state)
                    r = mass_apply(aa * free) + rE
                    if has_visc:
                        r = r + visc_apply(va + fac1 * aa)
                    ctx = {"Ct": Ct}
                    if has_contact:
                        rc_, blocks_l, aux_l = contact_assemble(
                            xa + fac0 * aa
                        )
                        r = r + rc_
                        ctx["cblocks"] = blocks_l
                        if consistent_ct:
                            ctx["c_ueval"] = xa + fac0 * aa
                    r = (r - rhs) * free
                    # block-Jacobi (dim x dim per control point):
                    # M + fac1 S + fac0 (K + Kc) node-diagonal blocks —
                    # the scalar diagonal stalls on contact-stiff
                    # tangents (penalty ~1e11)
                    C4 = jnp.moveaxis(
                        Ct.reshape(dim, dim, dim, dim, n_el, n_q),
                        (4, 5),
                        (0, 1),
                    )  # (e, q, c, d, g, f)
                    k_block_el = jnp.einsum(
                        "eq,eqnd,eqcdgf,eqnf->encg", wdet, dNdX, C4,
                        dNdX,
                    )
                    nblocks = (
                        jnp.zeros((n_dof, dim, dim), aa.dtype)
                        .at[conn]
                        .add(k_block_el)
                    ) * fac0
                    eye = jnp.eye(dim, dtype=aa.dtype)
                    nblocks = nblocks + m_diag[:, None, None] * eye
                    if has_visc:
                        nblocks = (
                            nblocks + fac1 * s_diag[:, None, None] * eye
                        )
                    if has_contact:
                        nblocks = nblocks + fac0 * contact_node_blocks(
                            ctx["cblocks"]
                        )
                    ctx["bj_inv"] = block_jacobi_inverse(nblocks, free)
                    return r, ctx

                def solve_fn(ctx, r):
                    Ct = ctx["Ct"]
                    c_tan = make_contact_tan(ctx) if has_contact else None

                    def K_apply(w):
                        w_el = w[conn]
                        # batch-last throughout: dF as (d2, eq)
                        dF_t = jnp.einsum(
                            "emg,eqmf->gfeq", w_el, dNdX
                        ).reshape(d2, n_el * n_q)
                        dP_t = jnp.einsum("abx,bx->ax", Ct, dF_t)
                        dP = jnp.moveaxis(
                            dP_t.reshape(dim, dim, n_el, n_q),
                            (0, 1),
                            (2, 3),
                        )
                        y_el = jnp.einsum(
                            "eq,eqnd,eqcd->enc", wdet, dNdX, dP
                        )
                        return (
                            jnp.zeros((n_dof, dim), w.dtype)
                            .at[conn]
                            .add(y_el)
                        )

                    def J_apply(w_flat):
                        w = w_flat.reshape(n_dof, dim) * free
                        y = mass_apply(w) + fac0 * K_apply(w)
                        if has_visc:
                            y = y + fac1 * visc_apply(w)
                        if has_contact:
                            y = y + fac0 * c_tan(w)
                        return (
                            y * free
                            + w_flat.reshape(n_dof, dim) * (1 - free)
                        ).reshape(-1)

                    # in-tree transpose-free GMRES (the consistent
                    # J2 tangent is nonsymmetric at plastic states)
                    # with the block-Jacobi preconditioner
                    bj = ctx["bj_inv"]
                    c, li = gmres(
                        J_apply,
                        r.reshape(-1),
                        M_apply=lambda v: block_jacobi_apply(
                            bj, v
                        ),
                        rel_tol=lin_rel_tol,
                        abs_tol=lin_abs_tol,
                        restart=min(gmres_restart, cg_iters),
                        max_iter=cg_iters,
                        return_info=True,
                    )
                    return c.reshape(n_dof, dim), li["iters"]

            else:

                def assemble_fn(aa):
                    rE, Ct = assemble_PC_t(aa, xa, state)
                    r = mass_apply(aa * free) + rE
                    if has_visc:
                        r = r + visc_apply(va + fac1 * aa)
                    C = Ct.transpose(2, 0, 1).reshape(
                        n_el, n_q, dim, dim, dim, dim
                    )
                    blocks = jnp.einsum(
                        "eq,eqnd,eqcdgf,eqmf->encmg", wdet, dNdX, C, dNdX
                    )
                    nd = conn.shape[1]
                    blocks = blocks.reshape(n_el, nd * dim, nd * dim)
                    J = fac0 * K.scatter_dense_vblocks(
                        blocks, conn, n_dof, dim
                    ) + K.dense_from_scalar_blocks_jnp(
                        mass_blocks, conn, n_dof, dim
                    )
                    if has_visc:
                        J = J + fac1 * K.dense_from_scalar_blocks_jnp(
                            d["visc_blocks"], conn, n_dof, dim
                        )
                    if has_contact:
                        rc_, blocks_l, aux_l = contact_assemble(
                            xa + fac0 * aa
                        )
                        r = r + rc_
                        for cd, cb in zip(cdata, blocks_l):
                            J = J + fac0 * K.scatter_dense_vblocks(
                                cb, cd["conn"], n_dof, dim
                            )
                    r = (r - rhs) * free
                    J = J * jnp.outer(free_flat, free_flat) + jnp.diag(
                        1.0 - free_flat
                    )
                    return r, {"J": J}

                def solve_fn(ctx, r):
                    return jnp.linalg.solve(
                        ctx["J"], r.reshape(-1)
                    ).reshape(n_dof, dim), jnp.int32(0)

            def newton(aa0):
                """lax.while_loop port of LineSearchNewton::Mult
                (newton.cpp:99-202): convergence goal, line-search
                scale-floor abort, 5-iteration best-improvement window,
                best-iterate return."""
                r0, ctx0 = assemble_fn(aa0)
                norm0 = jnp.linalg.norm(r0)
                goal = jnp.maximum(rel_tol * norm0, abs_tol)
                inf = jnp.asarray(jnp.inf, norm0.dtype)

                def cond(c):
                    return (
                        (~c["stop"])
                        & jnp.isfinite(c["norm"])
                        & (c["norm"] > goal)
                        & (c["it"] < max_iter)
                        & (c["window"] != 0)
                    )

                def body(c):
                    aa, r, ctx = c["aa"], c["r"], c["ctx"]
                    step_c, li = solve_fn(ctx, r)
                    q1 = c["norm"]
                    q3 = jnp.linalg.norm(res_fn(aa - step_c))
                    q2 = jnp.linalg.norm(res_fn(aa - 0.5 * step_c))
                    denom = q1 - 2.0 * q2 + q3
                    eps = (3.0 * q1 - 4.0 * q2 + q3) / (4.0 * denom)
                    scale = jnp.where(
                        (denom > 0) & (eps > 0) & (eps < 1),
                        eps,
                        jnp.where(q3 < q1, 1.0, 0.05),
                    )
                    stop_ls = jnp.abs(scale) < 1e-12
                    aa_new = jnp.where(
                        stop_ls, aa, aa - scale * step_c
                    )
                    r_new, ctx_new = assemble_fn(aa_new)
                    norm_new = jnp.linalg.norm(r_new)
                    better = norm_new < c["best_norm"]
                    take = better & (~stop_ls)
                    bit = jnp.where(better, jnp.int32(1), jnp.int32(0))
                    return {
                        "aa": aa_new,
                        "r": r_new,
                        "ctx": ctx_new,
                        "norm": jnp.where(stop_ls, c["norm"], norm_new),
                        "best_aa": jnp.where(take, aa_new, c["best_aa"]),
                        "best_norm": jnp.where(
                            take, norm_new, c["best_norm"]
                        ),
                        "window": jnp.where(
                            stop_ls,
                            c["window"],
                            ((c["window"] << 1) | bit) & jnp.int32(31),
                        ),
                        "it": jnp.where(stop_ls, c["it"], c["it"] + 1),
                        "lin_iters": c["lin_iters"] + li,
                        "stop": stop_ls,
                    }

                init = {
                    "aa": aa0,
                    "r": r0,
                    "ctx": ctx0,
                    "norm": norm0,
                    "best_aa": aa0,
                    "best_norm": inf,
                    "window": jnp.int32(31),
                    "it": jnp.int32(0),
                    "lin_iters": jnp.int32(0),
                    "stop": jnp.asarray(False),
                }
                fin = jax.lax.while_loop(cond, body, init)
                converged = fin["norm"] <= goal
                use_best = (
                    (~converged)
                    & jnp.isfinite(fin["norm"])
                    & (~fin["stop"])
                    & (fin["it"] > 0)
                )
                aa_fin = jnp.where(use_best, fin["best_aa"], fin["aa"])
                diag = {
                    "norm0": norm0,
                    "norm": jnp.where(
                        use_best, fin["best_norm"], fin["norm"]
                    ),
                    "iters": fin["it"],
                    "lin_iters": fin["lin_iters"],
                    "converged": converged,
                }
                return aa_fin, diag

            return newton

        def elem_accumulate(u_el, dNdX_e, state_e):
            F = I + jnp.einsum("nc,qnd->qcd", u_el, dNdX_e)
            return jax.vmap(
                lambda Fq, sq: mat.accumulate(Fq, sq, dt)
            )(F, state_e)

        u, v, a, state = (
            carry["u"],
            carry["v"],
            carry["a"],
            carry["state"],
        )
        if state is not None and prob.state_soa and not use_soa:
            # carry keeps the SoA layout; the einsum/dense engines
            # expect per-quad trailing tensor dims
            state = soa.state_from_soa(state)
        prev_fac = 1.0 - f["fac1_inv"]
        if has_cv:
            # dynamic Dirichlet values (boundary_conditions.cpp:209-258)
            cvm = d["cv_mask"]
            cvv = d["cv_vals"]
            xa_cv = u + cvv * dt
        if mode == "fp_solve":
            # FSI fixed-point inner solve (FixedPointSolve2,
            # ode.cpp:81-111): Newton at the alpha state the session
            # predicted once per step (carry["xa"]/["va"]), warm-started
            # from the previous sweep's acceleration.  Predict, preview
            # and commit stay host-side (api/nonlinear_solid.py).
            aa, newton_diag = make_newton(carry["xa"], carry["va"], state)(
                carry["aa"]
            )
            return {
                "aa": aa,
                "newton": dict(
                    newton_diag, finite=jnp.all(jnp.isfinite(aa))
                ),
            }
        if mode == "fp_commit":
            # AdvanceTime2 commit (ode.cpp:148-187): corrector + state
            # accumulation + contact observability at the converged
            # alpha state of the last fp_solve
            aa = carry["aa"]
            newton_diag = carry["newton"]
            xa = carry["xa"] + fac0 * aa
            va = carry["va"] + fac1 * aa
        else:
            xa = u + (v + f["fac0"] * dt * a) * f["fac1"] * dt
            va = v + f["fac2"] * dt * a
            if has_cv:
                # apply: at alpha level aa=0 (rows are masked),
                # va = v_bc, xa = x + v_bc*dt; restored after corrector
                xa = jnp.where(cvm > 0, xa_cv, xa)
                va = jnp.where(cvm > 0, cvv, va)
            aa, newton_diag = make_newton(xa, va, state)(
                jnp.zeros_like(u)
            )
            xa = xa + fac0 * aa
            va = va + fac1 * aa
        u_new = u * prev_fac + f["fac1_inv"] * xa
        v_new = v * prev_fac + f["fac1_inv"] * va
        a_new = a * prev_fac + f["fac5_inv"] * aa
        if has_cv:
            u_new = jnp.where(cvm > 0, xa_cv, u_new)
            v_new = jnp.where(cvm > 0, cvv, v_new)
            a_new = jnp.where(cvm > 0, 0.0, a_new)
        if state is not None:
            if use_soa:
                F_new = I_soa + grad_interp(gather_t(u_new))
                state = mat.accumulate_soa(F_new, state, dt)
            else:
                state = jax.vmap(elem_accumulate, in_axes=(0, 0, 0))(
                    u_new[conn], dNdX, state
                )
                if prob.state_soa:
                    state = soa.state_to_soa(state)
        # contact observability at the converged alpha level (the
        # reference records from its last residual assembly,
        # mortar_contact.cpp:469-488)
        contact_aux = []
        if has_contact:
            for cd, (pp, rp, _) in zip(cdata, contact_fns):
                pressure, area, qdiag = pp(xa, cd, cd["scene"], cd["penalty"])
                res_el, force, pint = rp(xa, cd, pressure)
                contact_aux.append(
                    {
                        "force": force,
                        "area": area,
                        "pressure": pint,
                        # boundary-sized nodal aux: lets the session
                        # fast engine serve the "contact_forces" npz
                        # export (nodal pressure_ + traction_) without
                        # falling back to the interactive engine
                        # (mortar_contact.cpp:469-488 semantics — the
                        # last residual assembly at the alpha level)
                        "nodal_pressure": pressure,
                        "res_el": res_el,
                        **qdiag,
                    }
                )
        # step-level finite guard (VERDICT r3 weak #3): out-of-range
        # material evaluations are NaN-poisoned on purpose
        # (materials/logm.py), and divergent solves also surface here;
        # the session engines raise on finite=False with a clear message
        finite = jnp.all(jnp.isfinite(u_new)) & jnp.all(
            jnp.isfinite(v_new)
        )
        if state is not None:
            for leaf in jax.tree.leaves(state):
                finite &= jnp.all(jnp.isfinite(leaf))
        newton_diag = dict(newton_diag, finite=finite)
        return {
            "u": u_new,
            "v": v_new,
            "a": a_new,
            "state": state,
            "newton": newton_diag,
            "contact": contact_aux,
        }

    jitted = jax.jit(impl, static_argnames=("mode",))

    def _override(contact_scenes, rhs, penalties):
        if contact_scenes is None and rhs is None and penalties is None:
            return data
        d = dict(data)
        if contact_scenes is not None or penalties is not None:
            sc = contact_scenes or [cd["scene"] for cd in data["contact"]]
            pe = penalties or [cd["penalty"] for cd in data["contact"]]
            d["contact"] = [
                dict(cd, scene=s, penalty=jnp.asarray(p, prob.rhs.dtype))
                for cd, s, p in zip(data["contact"], sc, pe)
            ]
        if rhs is not None:
            d["rhs"] = jnp.asarray(rhs, prob.rhs.dtype)
        return d

    def step(carry, contact_scenes=None, rhs=None, penalties=None):
        """One generalized-alpha step.  contact_scenes: fresh per-block
        scene data (rigid-tool sweeps).  rhs: override of the
        body-force/traction right-hand side (n_dof, dim) — the FSI /
        linear-form-view steering hook (the reference writes through
        LinearFormView2, py_solid.cpp:363-388).  penalties: per-block
        contact penalty override (augmented-Lagrange outer loops mutate
        scene.coefficient between steps)."""
        return jitted(carry, _override(contact_scenes, rhs, penalties))

    def fp_solve(carry, contact_scenes=None, rhs=None, penalties=None):
        """FSI fixed-point inner solve (FixedPointSolve2,
        ode.cpp:81-111) through the compiled core.  `carry` additionally
        holds the session-predicted alpha state "xa"/"va" and the warm
        start "aa"; returns {"aa", "newton"}.  rhs steering between
        sweeps is the whole point of the trio — pass the fresh loads
        each call."""
        return jitted(
            carry,
            _override(contact_scenes, rhs, penalties),
            mode="fp_solve",
        )

    def fp_commit(carry, contact_scenes=None, rhs=None, penalties=None):
        """AdvanceTime2 commit (ode.cpp:148-187): corrector + material
        state accumulation + contact observability at the converged
        alpha state.  `carry` holds "xa"/"va"/"aa"/"newton" from the
        last fp_solve; returns a regular step carry."""
        return jitted(
            carry,
            _override(contact_scenes, rhs, penalties),
            mode="fp_commit",
        )

    step.fp_solve = fp_solve
    step.fp_commit = fp_commit
    return step


def shard_problem(prob: Problem, mesh: Mesh) -> Problem:
    """Places element-axis arrays sharded over mesh axis 'e', dof arrays
    replicated.  Contact boundary-element tables shard along the same
    axis (their mortar scatter reduces over ICI like the domain one);
    scene data and penalties replicate."""
    e_shard = NamedSharding(mesh, P("e"))
    rep = NamedSharding(mesh, P())
    put_e = lambda a: jax.device_put(a, e_shard)
    put_r = lambda a: jax.device_put(a, rep)

    def put_e_state(a):
        # SoA state leaves are (*tensor_dims, n_q, n_el): the element
        # axis is last.  Per-quad layout leaves have it at 0.
        if prob.state_soa:
            spec = P(*([None] * (a.ndim - 1)), "e")
        else:
            spec = P("e")
        return jax.device_put(a, NamedSharding(mesh, spec))
    contact = [
        {
            "conn": put_e(cd["conn"]),
            "N": put_e(cd["N"]),
            "dN": put_e(cd["dN"]),
            "wq": put_e(cd["wq"]),
            "nsign": put_e(cd["nsign"]),
            "ldof": put_e(cd["ldof"]),
            "x_ref_el": put_e(cd["x_ref_el"]),
            "scene": jax.tree.map(put_r, cd["scene"]),
            "penalty": put_r(cd["penalty"]),
        }
        for cd in prob.contact
    ]
    return Problem(
        material=prob.material,
        n_dof=prob.n_dof,
        dim=prob.dim,
        n_el=prob.n_el,
        n_q=prob.n_q,
        conn=put_e(prob.conn),
        dN_dX=put_e(prob.dN_dX),
        w_detJ=put_e(prob.w_detJ),
        N=put_e(prob.N),
        mass_blocks=put_e(prob.mass_blocks),
        rhs=put_r(prob.rhs),
        free=put_r(prob.free),
        facs=prob.facs,
        state0=jax.tree.map(put_e_state, prob.state0)
        if prob.state0 is not None
        else None,
        visc_blocks=put_e(prob.visc_blocks)
        if prob.visc_blocks is not None
        else None,
        cv_mask=put_r(prob.cv_mask)
        if prob.cv_mask is not None
        else None,
        cv_vals=put_r(prob.cv_vals)
        if prob.cv_vals is not None
        else None,
        contact=contact,
        contact_static=prob.contact_static,
        state_soa=prob.state_soa,
        fdm=prob.fdm,
        grid=None,
        x_ref=prob.x_ref,
    )


def make_forward(prob: Problem, dt: float):
    """Jittable forward operator: the Newton residual
    y = M aa + E(xa + fac0 aa) - f with Dirichlet rows masked.  Used by the
    single-chip compile check.  Large arrays are bound as call-time
    arguments (see make_step note on XLA constant folding)."""
    mat = prob.material
    dim = prob.dim
    n_dof = prob.n_dof
    I = jnp.eye(dim, dtype=prob.rhs.dtype)
    fac0 = prob.facs["fac3"] * dt * dt
    data = {
        "conn": prob.conn,
        "dNdX": prob.dN_dX,
        "wdet": prob.w_detJ,
        "mass_blocks": prob.mass_blocks,
        "rhs": prob.rhs,
        "free": prob.free,
    }

    def elem_residual(u_el, dNdX_e, wdet_e, state_e):
        F = I + jnp.einsum("nc,qnd->qcd", u_el, dNdX_e)
        P_ = jax.vmap(lambda Fq, sq: mat.pk1(Fq, sq, dt))(F, state_e)
        return jnp.einsum("q,qnd,qcd->nc", wdet_e, dNdX_e, P_)

    batched_res = jax.vmap(elem_residual, in_axes=(0, 0, 0, 0))

    def impl(aa, xa, va, state, d):
        conn = d["conn"]
        if state is not None and prob.state_soa:
            state = soa.state_from_soa(state)
        res_el = batched_res(
            (xa + fac0 * aa)[conn], d["dNdX"], d["wdet"], state
        )
        ye = jnp.einsum("enm,emc->enc", d["mass_blocks"], (aa * d["free"])[conn])
        y = jnp.zeros((n_dof, dim), aa.dtype).at[conn].add(ye)
        y = y.at[conn].add(res_el)
        return (y - d["rhs"]) * d["free"]

    jitted = jax.jit(impl)

    def forward(aa, xa, va, state):
        return jitted(aa, xa, va, state, data)

    return forward
