"""`to_splinepy` parity (/root/reference/mimi/base.py:7-26): extract the
solver's NURBS as a spline object with lexicographic control points plus
the MFEM<->lexicographic dof permutations.

Returns (spline, to_m, to_s) with to_s[lex] = mfem dof (so
`mfem_ordered[to_s] == lex_ordered`) and to_m its inverse, matching the
splinepy.io.mfem.dof_mapping contract used by the reference examples.
"""

from __future__ import annotations

import numpy as np

from ..splines import BSpline, NURBS
from .solid import Solid


def to_splinepy(pysolid):
    if not isinstance(pysolid, Solid):
        raise TypeError("Expecting mimi.PySolid types.")

    d = pysolid.nurbs()  # MFEM dof order
    to_s = pysolid.dof_map_lex_to_mfem()
    to_m = np.empty_like(to_s)
    to_m[to_s] = np.arange(len(to_s))

    cps_lex = np.asarray(d["control_points"])[to_s]
    ws = np.asarray(d["weights"])
    if np.all(ws == ws[0]):
        s = BSpline(
            degrees=d["degrees"],
            control_points=cps_lex,
            knot_vectors=d["knot_vectors"],
        )
    else:
        s = NURBS(
            degrees=d["degrees"],
            control_points=cps_lex,
            knot_vectors=d["knot_vectors"],
            weights=ws[to_s],
        )
    return s, np.array(to_m, dtype=int), np.array(to_s, dtype=int)
