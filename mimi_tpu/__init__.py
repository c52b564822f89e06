"""mimi_tpu — TPU-native isogeometric solid mechanics in JAX.

A ground-up rebuild of the capabilities of j042/mimi (NURBS FEM, nonlinear
solid dynamics, J2 plasticity, penalty contact against rigid splines) with a
TPU-first architecture: batched dense element kernels, segment-sum assembly,
AD tangents, jit-compiled Newton + generalized-alpha stepping, and
jax.sharding-based multi-chip scale-out.

Public API mirrors `import mimi` from the reference
(/root/reference/mimi/__init__.py, src/mimi/py/mimi_core.cpp:15-24).
"""

from . import config  # noqa: F401  (enables x64 before anything else)

from .api.boundary_conditions import BoundaryConditions  # noqa: E402
from .api.runtime_communication import RuntimeCommunication  # noqa: E402
from .api.solid import Solid  # noqa: E402
from .api.nonlinear_solid import NonlinearSolid  # noqa: E402
from .materials import (  # noqa: E402
    Material,
    StVenantKirchhoff,
    CompressibleOgdenNeoHookean,
    J2Linear,
    J2,
    J2Simo,
    J2Log,
)
from .materials.hardening import (  # noqa: E402
    Hardening,
    PowerLawHardening,
    VoceHardening,
    JohnsonCookHardening,
    JohnsonCookRateDependentHardening,
    JohnsonCookTemperatureAndRateDependentHardening,
    JohnsonCookViscoConstantTemperatureHardening,
)
from .contact.scene import (  # noqa: E402
    NearestDistance,
    NearestDistanceToSplines,
)
from .api.splinepy_bridge import to_splinepy  # noqa: E402
from .utils.ad import AD as PyAD, ADVec as PyADVec  # noqa: E402
from .utils import log  # noqa: E402

__all__ = [
    "BoundaryConditions",
    "RuntimeCommunication",
    "Solid",
    "NonlinearSolid",
    "Material",
    "StVenantKirchhoff",
    "CompressibleOgdenNeoHookean",
    "J2Linear",
    "J2",
    "J2Simo",
    "J2Log",
    "Hardening",
    "PowerLawHardening",
    "VoceHardening",
    "JohnsonCookHardening",
    "JohnsonCookRateDependentHardening",
    "JohnsonCookTemperatureAndRateDependentHardening",
    "JohnsonCookViscoConstantTemperatureHardening",
    "NearestDistance",
    "NearestDistanceToSplines",
    "to_splinepy",
    "PyAD",
    "PyADVec",
    "log",
]
