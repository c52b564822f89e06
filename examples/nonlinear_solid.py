"""Hyperelastic cantilever under body force, implicit generalized-alpha
dynamics (port of the reference's examples/nonlinear_solid.py, headless:
the live viewer is replaced by an npz trajectory export)."""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

import numpy as np

import mimi_tpu as mimi

DATA = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests",
    "data",
)

# create nl solid
nl = mimi.NonlinearSolid()
nl.read_mesh(os.path.join(DATA, "balken.mesh"))
# refine
nl.elevate_degrees(1)
nl.subdivide(2)

# create material
mat = mimi.CompressibleOgdenNeoHookean()
mat.density = 1
mat.viscosity = -1
mat.set_young_poisson(2100, 0.3)
nl.set_material(mat)

# create spline counterpart for post-processing
s, to_m, to_s = mimi.to_splinepy(nl)
o_cps = s.cps.copy()

bc = mimi.BoundaryConditions()
bc.initial.dirichlet(2, 0).dirichlet(2, 1)
bc.initial.body_force(1, -5)

nl.boundary_condition = bc

rc = mimi.RuntimeCommunication()
rc.set_fname(os.environ.get("MIMI_OUT", "nonlinear_solid_out.npz"))
rc.append_should_save("x", 10)
nl.runtime_communication = rc

nl.setup(2)
nl.configure_newton("nonlinear_solid", 1e-12, 1e-8, 10, False)

nl.time_step_size = 0.05

u = nl.solution_view("displacement", "x").reshape(-1, nl.mesh_dim())

n_steps = int(os.environ.get("MIMI_STEPS", "100"))
for i in range(n_steps):
    nl.step_time2()
    if i % 10 == 0:
        tip = u[to_s][-1]
        print(
            f"step {i:4d}  t={nl.current_time:6.2f}  "
            f"tip=({tip[0]:+8.4f}, {tip[1]:+8.4f})"
        )

print("done; trajectory in", rc.fname)
