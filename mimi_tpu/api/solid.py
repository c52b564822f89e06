"""`Solid`: session object owning mesh, refinement, BCs, solvers and the
time-stepping driver.  API parity with the reference's `PySolid` bindings
(/root/reference/src/mimi/py/py_solid.cpp:9-68).
"""

from __future__ import annotations

import numpy as np

from ..nurbs.mesh_io import read_mfem_nurbs_mesh, write_mfem_nurbs_mesh
from ..nurbs.topology import PatchTopology, build_patch_from_mesh
from .boundary_conditions import BoundaryConditions
from .runtime_communication import RuntimeCommunication


class Solid:
    def __init__(self):
        self._mesh = None
        self._patch = None
        self._topo = None
        self.boundary_condition: BoundaryConditions | None = None
        self.runtime_communication: RuntimeCommunication | None = None
        self._t = 0.0
        self._dt = 0.0
        self._splines = {}
        # populated by NonlinearSolid.setup()
        self._system = None
        self._views = {}
        # multi-patch state: refinement is recorded and applied when the
        # MultiPatchFESpace is built (setup or a count query)
        self._n_elevate = 0
        self._n_subdivide = 0
        self._mp_space = None

    # ----------------- mesh management -----------------
    def read_mesh(self, fname: str) -> None:
        """Load any MFEM NURBS mesh — single- or multi-patch (parity:
        PySolid::ReadMesh rejects only non-NURBS meshes,
        py_solid.cpp:70-95)."""
        self._mesh = read_mfem_nurbs_mesh(fname)
        self._n_elevate = 0
        self._n_subdivide = 0
        self._mp_space = None
        if len(self._mesh.elements) > 1:
            self._patch = None
            self._topo = None
        else:
            self._patch, self._topo, _ = build_patch_from_mesh(self._mesh)

    @property
    def _multipatch(self) -> bool:
        return self._mesh is not None and len(self._mesh.elements) > 1

    def _build_fespace(self):
        """The FE space the system assembles over (also used by the
        count queries): single-patch FESpace or MultiPatchFESpace."""
        if self._multipatch:
            if self._mp_space is None:
                from ..fem.multipatch import MultiPatchFESpace

                self._mp_space = MultiPatchFESpace(
                    self._mesh,
                    elevate=self._n_elevate,
                    subdivide=self._n_subdivide,
                )
            return self._mp_space
        from ..fem.space import FESpace

        return FESpace(self._require_mesh(), self._topo)

    def save_mesh(self, fname: str) -> None:
        """Write the current (refined) mesh — single- or multi-patch
        (parity: PySolid::SaveMesh uses mfem's generic NURBS printer,
        py_solid.cpp:97-107)."""
        if self._multipatch:
            from ..nurbs.mesh_io import write_mfem_nurbs_mesh_multipatch

            fes = self._build_fespace()
            topo = fes.topo
            # refined knot vector for each kv index, taken from any
            # patch axis that references it (shared kvs refine alike)
            kvs = [None] * len(self._mesh.knot_vectors)
            for p in range(topo.n_patches):
                for a, kvi in enumerate(topo.patch_kv[p]):
                    if kvs[kvi] is None:
                        kvs[kvi] = (
                            fes.patches[p].degrees[a],
                            fes.patches[p].knot_vectors[a],
                        )
            write_mfem_nurbs_mesh_multipatch(
                fname, self._mesh, kvs, fes.x_ref, fes.weights, fes.dim
            )
            return
        perm = self.dof_map_lex_to_mfem()
        write_mfem_nurbs_mesh(fname, self._mesh, perm, self._patch)

    def _require_mesh(self):
        if self._patch is None:
            if self._multipatch:
                raise RuntimeError(
                    "operation requires a single-patch mesh"
                )
            raise RuntimeError("Mesh not set.")
        return self._patch

    def mesh_dim(self) -> int:
        if self._multipatch:
            return self._mesh.dimension
        return self._require_mesh().dim

    def mesh_degrees(self) -> list[int]:
        if self._multipatch:
            return [
                p + self._n_elevate
                for p in self._mesh.knot_degrees[: self._mesh.dimension]
            ]
        return list(self._require_mesh().degrees)

    def n_vertices(self) -> int:
        return self._counts()[0]

    def n_elements(self) -> int:
        return self._counts()[1]

    def n_boundary_elements(self) -> int:
        return self._counts()[2]

    def n_subelements(self) -> int:
        return self._counts()[3]

    def _counts(self):
        if self._multipatch:
            return self._build_fespace().counts()
        p = self._require_mesh()
        return PatchTopology.counts(p.n_spans(), p.n_ctrl())

    def elevate_degrees(self, degrees: int, max_degrees: int = 50) -> None:
        if degrees <= 0:
            return
        if self._multipatch:
            self._n_elevate += degrees
            self._mp_space = None
            return
        self._require_mesh().elevate_degrees(degrees, max_degrees)

    def subdivide(self, n_subdivision: int) -> None:
        if n_subdivision <= 0:
            return
        if self._multipatch:
            self._n_subdivide += n_subdivision
            self._mp_space = None
            return
        for _ in range(n_subdivision):
            self._require_mesh().uniform_refine()

    # ----------------- dof maps / nurbs export -----------------
    def dof_map_lex_to_mfem(self) -> np.ndarray:
        """perm[lex] = mfem dof id for the *current* (refined) patch.
        The multi-patch numbering is built in MFEM order directly, so
        its permutation is the identity."""
        if self._multipatch:
            return np.arange(self._build_fespace().n_dof)
        return self._topo.lex_to_mfem(self._patch.n_ctrl())

    def dof_map(self, fe_space: str = "displacement") -> np.ndarray:
        """NURBSExtension::DofMap parity (py_solid.cpp:320-332): identity
        for non-periodic spaces, full-node -> reduced-dof map when
        boundaries are connected."""
        if self._system is not None:
            return self._system.dof_map()
        if self._multipatch:
            return np.arange(self._build_fespace().n_dof, dtype=int)
        n = self._patch.n_ctrl_total()
        return np.arange(n, dtype=int)

    def nurbs(self) -> dict:
        """Degrees / knot vectors / control points / weights in MFEM dof
        order (parity: py_solid.cpp:237-293 — on multi-patch meshes the
        reference likewise returns the first `dim` knot vectors plus
        ALL mesh nodes/weights)."""
        if self._multipatch:
            fes = self._build_fespace()
            p0 = fes.patches[0]
            return {
                "degrees": list(p0.degrees),
                "knot_vectors": [
                    list(map(float, kv)) for kv in p0.knot_vectors
                ],
                "control_points": fes.x_ref.copy(),
                "weights": fes.weights.copy(),
            }
        p = self._require_mesh()
        perm = self.dof_map_lex_to_mfem()
        n = p.n_ctrl_total()
        inv = np.empty(n, dtype=int)
        inv[perm] = np.arange(n)
        return {
            "degrees": list(p.degrees),
            "knot_vectors": [list(map(float, kv)) for kv in p.knot_vectors],
            "control_points": p.control_points[inv].copy(),
            "weights": p.weights[inv].copy(),
        }

    def add_spline(self, spline_name: str, spline) -> None:
        self._splines[spline_name] = spline

    # ----------------- runtime communication -----------------
    def _rc(self) -> RuntimeCommunication:
        if self.runtime_communication is None:
            self.runtime_communication = RuntimeCommunication()
        return self.runtime_communication

    # ----------------- time stepping facade -----------------
    @property
    def current_time(self) -> float:
        return self._t

    @property
    def time_step_size(self) -> float:
        return self._dt

    @time_step_size.setter
    def time_step_size(self, dt: float) -> None:
        self._dt = float(dt)

    def _require_system(self):
        if self._system is None:
            raise RuntimeError("setup() has not been called.")
        return self._system

    def setup(self, nthreads: int = 1) -> None:
        raise NotImplementedError("use NonlinearSolid")

    def configure_newton(
        self,
        name: str,
        rel_tol: float,
        abs_tol: float,
        max_iter: int,
        iterative_mode: bool,
    ) -> None:
        self._require_system().configure_newton(
            name, rel_tol, abs_tol, max_iter, iterative_mode
        )

    def newton_final_norms(self):
        return self._require_system().newton_final_norms()

    def nonlinear_from2(self, nlf_name: str):
        """Reference binding name (py_solid.cpp:52)."""
        return self._require_system().nonlinear_form2(nlf_name)

    def nonlinear_form2(self, nlf_name: str):
        return self._require_system().nonlinear_form2(nlf_name)

    def solution_view(self, fe_space_name: str, component_name: str):
        return self._require_system().solution_view(
            fe_space_name, component_name
        )

    def linear_form_view2(self, lf_name: str):
        return self._require_system().linear_form_view2(lf_name)

    def boundary_dof_ids(self, fe_space_name: str, bid: int, dim: int):
        return self._require_system().boundary_dof_ids(bid, dim)

    def zero_dof_ids(self, fe_space_name: str):
        return self._require_system().zero_dof_ids()

    def step_time2(self) -> None:
        sys = self._require_system()
        self._t = sys.step_time2(self._t, self._dt)
        rc = self._rc()
        if rc.should_save("x"):
            rc.save_dynamic_vector("x_", sys.mfem_ordered("x"))
        if rc.should_save("v"):
            rc.save_dynamic_vector("v_", sys.mfem_ordered("x_dot"))
        rc.next_time_step(self._dt)

    def fixed_point_solve2(self) -> None:
        self._require_system().fixed_point_solve2(self._t, self._dt)

    def fixed_point_advance2(self):
        return self._require_system().fixed_point_advance2(self._t, self._dt)

    def fixed_point_advanced_vector_views(self):
        return self._require_system().fixed_point_advanced_vector_views()

    def save_checkpoint(self, fname: str) -> None:
        from ..utils.checkpoint import save_checkpoint

        save_checkpoint(self, fname)

    def load_checkpoint(self, fname: str) -> None:
        from ..utils.checkpoint import load_checkpoint

        load_checkpoint(self, fname)

    def advance_time2(self) -> None:
        sys = self._require_system()
        self._t = sys.advance_time2(self._t, self._dt)
        rc = self._rc()
        if rc.should_save("x"):
            rc.save_dynamic_vector("x_", sys.mfem_ordered("x"))
        if rc.should_save("v"):
            rc.save_dynamic_vector("v_", sys.mfem_ordered("x_dot"))
        rc.next_time_step(self._dt)
