"""Boundary-condition registry with the reference's fluent builder API.

Parity with /root/reference/src/mimi/utils/boundary_conditions.{hpp,cpp}:
`bc.initial.dirichlet(bid, dim).body_force(1, -5)` etc.  `bid` indexes
boundary attributes zero-based (attribute = bid + 1), exactly as the
reference's marker arrays (py_solid.cpp:184-235).
"""

from __future__ import annotations


class BCMarker:
    def __init__(self, initial_config: bool):
        self._initial_config = initial_config
        self.dirichlet_: dict[int, set] = {}
        self.pressure_: dict[int, float] = {}
        self.traction_: dict[int, dict[int, float]] = {}
        self.body_force_: dict[int, float] = {}
        self.contact_: dict[int, object] = {}
        self.constant_velocity_: dict[int, dict[int, float]] = {}
        self.periodic_boundaries_: dict[int, int] = {}

    def _only_initial(self, name):
        if not self._initial_config:
            raise RuntimeError(
                f"{name} boundary condition is currently only available "
                "for initial config."
            )

    def _only_current(self, name):
        if self._initial_config:
            raise RuntimeError(
                f"{name} boundary condition is currently only available "
                "for current config."
            )

    def dirichlet(self, bid: int, dim: int) -> "BCMarker":
        self._only_initial("Dirichlet")
        self.dirichlet_.setdefault(bid, set()).add(dim)
        return self

    def pressure(self, bid: int, value: float) -> "BCMarker":
        self._only_initial("Pressure")
        self.pressure_[bid] = value
        return self

    def traction(self, bid: int, dim: int, value: float) -> "BCMarker":
        self._only_initial("Traction")
        self.traction_.setdefault(bid, {})[dim] = value
        return self

    def body_force(self, dim: int, value: float) -> "BCMarker":
        self._only_initial("BodyForce")
        self.body_force_[dim] = value
        return self

    def contact(self, bid: int, nearest_distance_coeff) -> "BCMarker":
        self._only_current("Contact")
        self.contact_[bid] = nearest_distance_coeff
        return self

    def constant_velocity(self, bid: int, dim: int, value: float) -> "BCMarker":
        self._only_initial("ConstantVelocity")
        self.dirichlet(bid, dim)
        self.constant_velocity_.setdefault(bid, {})[dim] = value
        return self

    def periodic(self, bid0: int, bid1: int) -> "BCMarker":
        self._only_initial("PeriodicBoundary")
        self.periodic_boundaries_[bid0] = bid1
        return self


class BoundaryConditions:
    def __init__(self):
        self.initial = BCMarker(initial_config=True)
        self.current = BCMarker(initial_config=False)

    def print(self):
        print("Boundary Condition Info")
        print("  dirichlet:", self.initial.dirichlet_)
        print("  traction:", self.initial.traction_)
        print("  body_force:", self.initial.body_force_)
        print("  constant_velocity:", self.initial.constant_velocity_)
        print("  periodic:", self.initial.periodic_boundaries_)
        print("  contact:", list(self.current.contact_.keys()))
