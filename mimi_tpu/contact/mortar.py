"""Mortar-averaged penalty contact against rigid spline scenes.

Algorithm parity with the reference's MortarContact integrator
(/root/reference/src/mimi/integrators/mortar_contact.{hpp,cpp}; De Lorenzis
NURBS contact formulation):

pass 1 (all marked boundary elements): per quadrature point closest-point
query at current coords (u + x_ref), unit spline normal, normal gap clamped
min(g, 0) with the 1e-5 angle-tolerance gate; mortar-averaged nodal gap and
area via scatter-add; nodal pressure p = gap/area * penalty.

pass 2: traction residual t = -(w detJ p) n with n the *element* surface
normal, assembled only where p != 0 (here: masked — contributions vanish
with p).  The tangent differentiates pass 2 at frozen nodal pressure,
exactly like the reference's per-element forward differences
(mortar_contact.cpp:263-295), via jax.jacfwd.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.lax import Precision as _Prec
import numpy as np


def _unit_normal_from_J(J):
    """ComputeUnitNormal (integrator_utils.hpp:216-251): J is (dim, dim-1)
    column-major tangents."""
    if J.shape[0] == 2:
        d0, d1 = J[0, 0], J[1, 0]
        inv = 1.0 / jnp.sqrt(d0 * d0 + d1 * d1)
        return jnp.array([d1 * inv, -d0 * inv])
    n = jnp.cross(J[:, 0], J[:, 1])
    return n / jnp.linalg.norm(n)


def _det_surf(J):
    if J.shape[0] == 2:
        return jnp.linalg.norm(J[:, 0])
    return jnp.linalg.norm(jnp.cross(J[:, 0], J[:, 1]))


def make_contact_fns(dim: int, n_local: int, batched_query):
    """Pure-function mortar passes over explicitly-passed table arrays.

    `cd` is a dict of element tables for one marked boundary block:
      conn (n_mb, nd) global scalar dofs, N (n_mb, q, nd),
      dN (n_mb, q, nd, dim-1), wq (n_mb, q), nsign (n_mb,),
      ldof (n_mb, nd) local mortar dof ids, x_ref_el (n_mb, nd, dim).

    Passing tables as arguments (instead of closing over them) lets the
    compiled sharded step feed them through jit as call-time data — the
    same math serves the interactive session (MortarContactBlock binds
    the tables) and the compiled core (sharding.make_step).
    Algorithm parity: mortar_contact.cpp:148-295.
    """

    def pressure_pass(u, cd, scene_data, penalty):
        cur = u[cd["conn"]] + cd["x_ref_el"]  # (n_mb, nd, dim)
        N = cd["N"]
        qpts = jnp.einsum("eqn,end->eqd", N, cur, precision=_Prec.HIGHEST)
        n_mb, n_q, _ = qpts.shape
        qflat = qpts.reshape(-1, dim)
        # The closest-point query runs on a STOPPED copy of the
        # quadrature points, and the normal gap is reconstructed below
        # from the stopped foot point/normal and the LIVE qpts.  The
        # value is identical (same formula the query uses internally);
        # the derivative is the envelope-theorem consistent tangent:
        # at a converged foot point  d(gap) = n . d(qpt)  exactly —
        # the foot-point motion is tangential (n . d1 = 0) and dn is
        # orthogonal to the gap vector, so differentiating through the
        # projection iteration is provably unnecessary.  This is what
        # makes jvp-based consistent contact tangents
        # (sharding.make_step(contact_tangent="consistent")) cost no
        # more than a primal pressure pass.
        res = batched_query(jax.lax.stop_gradient(qflat), scene_data)
        # projection-convergence observability (the reference's splinepy
        # proximity reports `convergence`, nearest_distance.hpp:139-193):
        # count of foot points still moving at the iteration cap, and the
        # largest gradient norm among them (0 when all converged)
        if "converged" in res:
            unconv = ~res["converged"]
            qdiag = {
                "proj_unconverged": jnp.sum(unconv),
                "proj_res_max": jnp.max(
                    jnp.where(unconv, res["grad_norm"], 0.0)
                ),
            }
        else:
            qdiag = {
                "proj_unconverged": jnp.zeros((), jnp.int32),
                "proj_res_max": jnp.zeros((), u.dtype),
            }
        nrm_q = res["normal"]  # (n, dim), stopped
        phys_q = res["physical"]  # stopped
        true_g = (
            -jnp.sum(nrm_q * (phys_q - qflat), axis=1)
        ).reshape(n_mb, n_q)
        dist = res["distance"].reshape(n_mb, n_q)
        g = jnp.minimum(true_g, 0.0)
        # angle gate (mortar_contact.cpp:158-189)
        tiny = jnp.asarray(jnp.finfo(u.dtype).tiny, u.dtype)
        ratio = jnp.minimum(
            1.0, jnp.abs(true_g) / jnp.maximum(dist, tiny)
        )
        g = jnp.where(jnp.arccos(ratio) > 1.0e-5, 0.0, g)

        J = jnp.einsum("end,eqnk->eqdk", cur, cd["dN"], precision=_Prec.HIGHEST)
        det = jax.vmap(jax.vmap(_det_surf))(J)
        fac = cd["wq"] * det
        area_el = jnp.einsum("eq,eqn->en", fac, N, precision=_Prec.HIGHEST)
        gap_el = jnp.einsum("eq,eqn->en", fac * g, N, precision=_Prec.HIGHEST)
        ldof = cd["ldof"]
        area = jnp.zeros(n_local, u.dtype).at[ldof].add(area_el)
        gap = jnp.zeros(n_local, u.dtype).at[ldof].add(gap_el)
        # padded blocks can leave zero-area mortar dofs; the reference
        # never divides there (gap is also zero), guard the 0/0
        pressure = jnp.where(
            area > 0.0, gap / jnp.where(area > 0.0, area, 1.0), 0.0
        ) * penalty
        total_area = jnp.sum(fac)
        return pressure, total_area, qdiag

    def elem_residual(u_el, x_ref_e, N_e, dN_e, wq_e, p_el, n_sign):
        cur = u_el + x_ref_e
        p_q = jnp.einsum("qn,n->q", N_e, p_el, precision=_Prec.HIGHEST)
        J = jnp.einsum("nd,qnk->qdk", cur, dN_e, precision=_Prec.HIGHEST)
        det = jax.vmap(_det_surf)(J)
        nrm = n_sign * jax.vmap(_unit_normal_from_J)(J)
        fac = wq_e * det * p_q
        res = -jnp.einsum("q,qn,qd->nd", fac, N_e, nrm, precision=_Prec.HIGHEST)
        force = jnp.einsum("q,qd->d", fac, nrm, precision=_Prec.HIGHEST)
        return res, (force, jnp.sum(fac))

    def residual_pass(u, cd, pressure):
        p_el = pressure[cd["ldof"]]
        res_el, (force_el, pint_el) = jax.vmap(elem_residual)(
            u[cd["conn"]], cd["x_ref_el"], cd["N"], cd["dN"], cd["wq"],
            p_el, cd["nsign"],
        )
        return res_el, jnp.sum(force_el, axis=0), jnp.sum(pint_el)

    def elem_res_only(u_el, x_ref_e, N_e, dN_e, wq_e, p_el, n_sg):
        r, aux = elem_residual(u_el, x_ref_e, N_e, dN_e, wq_e, p_el, n_sg)
        return r, (r, aux)

    elem_jac = jax.jacfwd(elem_res_only, argnums=0, has_aux=True)

    def residual_grad_pass(u, cd, pressure):
        p_el = pressure[cd["ldof"]]
        jac_el, (res_el, (force_el, pint_el)) = jax.vmap(elem_jac)(
            u[cd["conn"]], cd["x_ref_el"], cd["N"], cd["dN"], cd["wq"],
            p_el, cd["nsign"],
        )
        n_mb, nd = cd["conn"].shape
        blocks = jac_el.reshape(n_mb, nd * dim, nd * dim)
        return res_el, blocks, jnp.sum(force_el, axis=0), jnp.sum(pint_el)

    return pressure_pass, residual_pass, residual_grad_pass


class MortarContactBlock:
    """One contact integrator: a marked subset of boundary elements vs one
    scene."""

    def __init__(self, scene, b_tables, marked: np.ndarray, x_ref, name):
        self.scene = scene
        self.name = name
        self.conn = b_tables.conn[marked]  # (n_mb, nd) global scalar dofs
        self.N = jnp.asarray(b_tables.N[marked])
        self.dN_dxi = jnp.asarray(b_tables.dN_dxi[marked])
        self.wq = jnp.asarray(b_tables.wq[marked])
        self.x_ref_el = jnp.asarray(x_ref[self.conn])  # (n_mb, nd, dim)
        self.dim = x_ref.shape[1]
        # surface-normal orientation of each marked element (mesh-file
        # vertex-order convention, as MFEM boundary transforms use)
        self.normal_sign = jnp.asarray(b_tables.normal_sign[marked])

        # local dof map (mortar_contact.cpp:34-90): unique marked scalar
        # dofs, ascending
        uniq = np.unique(self.conn)
        self.marked_dofs = uniq
        lookup = -np.ones(uniq.max() + 1, dtype=np.int64)
        lookup[uniq] = np.arange(len(uniq))
        self.ldof = jnp.asarray(lookup[self.conn])  # (n_mb, nd) local ids
        self.n_local = len(uniq)
        self.conn_j = jnp.asarray(self.conn)

        self._batched_query = scene.make_batched_query()
        self._build()

        # post-process records (BoundaryPostTimeAdvance)
        self.last_area = 0.0
        self.last_force = np.zeros(self.dim)
        self.last_pressure = 0.0
        self.last_traction_residual = None
        self.last_nodal_pressure = None

    def _build(self):
        cd = self.table_dict()
        pp, rp, rgp = make_contact_fns(
            self.dim, self.n_local, self._batched_query
        )
        self.pressure_pass = lambda u, scene_data, penalty: pp(
            u, cd, scene_data, penalty
        )
        self.residual_pass = lambda u, pressure: rp(u, cd, pressure)
        self.residual_grad_pass = lambda u, pressure: rgp(u, cd, pressure)

    def table_dict(self):
        """Element tables as the dict `make_contact_fns` consumes; also
        the payload the compiled sharded step ships through jit."""
        return {
            "conn": self.conn_j,
            "N": self.N,
            "dN": self.dN_dxi,
            "wq": self.wq,
            "nsign": self.normal_sign,
            "ldof": self.ldof,
            "x_ref_el": self.x_ref_el,
        }

    # jit-composable: full residual contribution (n_dof, dim)
    def add_residual(self, u, n_dof, scene_data, penalty):
        pressure, area, qdiag = self.pressure_pass(
            u, scene_data, penalty
        )
        res_el, force, pint = self.residual_pass(u, pressure)
        res = (
            jnp.zeros((n_dof, self.dim), u.dtype)
            .at[self.conn_j]
            .add(res_el)
        )
        aux = {
            "area": area,
            "force": force,
            "pressure": pint,
            "nodal_pressure": pressure,
            "residual": res,
            **qdiag,
        }
        return res, aux

    def add_residual_and_blocks(self, u, n_dof, scene_data, penalty):
        pressure, area, qdiag = self.pressure_pass(
            u, scene_data, penalty
        )
        res_el, blocks, force, pint = self.residual_grad_pass(u, pressure)
        res = (
            jnp.zeros((n_dof, self.dim), u.dtype)
            .at[self.conn_j]
            .add(res_el)
        )
        aux = {
            "area": area,
            "force": force,
            "pressure": pint,
            "nodal_pressure": pressure,
            "residual": res,
            **qdiag,
        }
        return res, blocks, aux

    def gap_norm(self, u, scene_data):
        """sqrt(sum of squared negative gaps) over all quad points
        (mortar_contact.cpp:423-467)."""
        cur = u[self.conn_j] + self.x_ref_el
        qpts = jnp.einsum("eqn,end->eqd", self.N, cur, precision=_Prec.HIGHEST)
        res = self._batched_query(
            qpts.reshape(-1, self.dim), scene_data
        )
        g = res["normal_gap"]
        return float(jnp.sqrt(jnp.sum(jnp.where(g < 0.0, g * g, 0.0))))

    def record(self, aux, rc):
        self.last_area = float(aux["area"])
        self.last_force = np.asarray(aux["force"])
        self.last_pressure = float(aux["pressure"])
        self.last_nodal_pressure = np.asarray(aux["nodal_pressure"])
        self.last_traction_residual = -np.asarray(aux["residual"])

    def post_time_advance(self, rc, perm_to_mfem_flat):
        if rc is None:
            return
        if rc.should_save("contact_history"):
            rc.record_real_history("area", self.last_area)
            rc.record_real_history("force_x", self.last_force[0])
            rc.record_real_history("force_y", self.last_force[1])
            fy = self.last_force[1]
            rc.record_real_history(
                "x_over_y",
                self.last_force[0] / fy if fy != 0.0 else float("nan"),
            )
            rc.record_real_history("pressure", self.last_pressure)
            if self.dim > 2:
                rc.record_real_history("force_z", self.last_force[2])
        if rc.should_save("contact_forces"):
            rc.save_dynamic_vector("pressure_", self.last_nodal_pressure)
            rc.save_dynamic_vector(
                "traction_",
                perm_to_mfem_flat(self.last_traction_residual),
            )
