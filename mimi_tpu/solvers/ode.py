"""Second-order implicit time integrators: generalized-alpha family and
Newmark family.

Math parity with /root/reference/src/mimi/solvers/ode.{hpp,cpp} (which
builds on mfem::GeneralizedAlpha2Solver).  Parameters from rho_inf:
    alpha_m = (2 - rho)/(1 + rho),   alpha_f = 1/(1 + rho),
    beta = (1 + alpha_m - alpha_f)^2 / 4,  gamma = 1/2 + alpha_m - alpha_f
and the predictor/corrector factor set of ode.cpp:5-14.

The integrator holds no field data itself; it drives an `operator` object
(the System) that provides explicit_accel, implicit_solve and
post_time_advance, and a `dynamic_dirichlet` hook for constant-velocity
boundaries (boundary_conditions.cpp:204-291).
"""

from __future__ import annotations

import jax.numpy as jnp


class GeneralizedAlpha2:
    def __init__(self, oper, rho_inf: float = 0.25):
        rho_inf = min(max(rho_inf, 0.0), 1.0)
        self.alpha_m = (2.0 - rho_inf) / (1.0 + rho_inf)
        self.alpha_f = 1.0 / (1.0 + rho_inf)
        self.beta = 0.25 * (1.0 + self.alpha_m - self.alpha_f) ** 2
        self.gamma = 0.5 + self.alpha_m - self.alpha_f
        self._init(oper)

    def _init(self, oper):
        self.oper = oper
        self.dynamic_dirichlet = None
        self.nstate = 0
        self.aa = None
        self.xa = None
        self.va = None
        self._fp_predict = True
        self.compute_factors()

    def compute_factors(self):
        self.fac0 = 0.5 - self.beta / self.alpha_m
        self.fac1 = self.alpha_f
        self.fac1_inv = 1.0 / self.alpha_f
        self.fac2 = self.alpha_f * (1.0 - self.gamma / self.alpha_m)
        self.fac3 = self.beta * self.alpha_f / self.alpha_m
        self.fac4 = self.gamma * self.alpha_f / self.alpha_m
        self.fac5 = self.alpha_m
        self.fac5_inv = 1.0 / self.alpha_m

    def name(self):
        return "GeneralizedAlpha2"

    # x, v, a live on the operator (System): oper.u, oper.v, oper.a
    def step_time2(self, t: float, dt: float) -> float:
        o = self.oper
        o.dt = dt
        prev_fac = 1.0 - self.fac1_inv
        fac0dt = self.fac0 * dt
        fac1dt = self.fac1 * dt
        fac2dt = self.fac2 * dt
        fac3dtdt = self.fac3 * dt * dt
        fac4dt = self.fac4 * dt

        if self.nstate == 0:
            o.a = o.explicit_accel(o.u, o.v)
            self.nstate = 1
            self.aa = jnp.zeros_like(o.a)

        # predict alpha levels
        xa = o.u + (o.v + fac0dt * o.a) * fac1dt
        va = o.v + fac2dt * o.a
        aa = self.aa

        if self.dynamic_dirichlet is not None:
            xa, va, aa, saved = self.dynamic_dirichlet.apply(
                t, dt, o.u, o.v, o.a, xa, va, aa
            )

        aa = o.implicit_solve(fac3dtdt, fac4dt, xa, va, aa)
        self.aa = aa

        # correct + extrapolate
        xa = xa + fac3dtdt * aa
        va = va + fac4dt * aa
        o.u = o.u * prev_fac + self.fac1_inv * xa
        o.v = o.v * prev_fac + self.fac1_inv * va
        o.a = o.a * prev_fac + self.fac5_inv * aa

        if self.dynamic_dirichlet is not None:
            o.u, o.v, o.a = self.dynamic_dirichlet.restore(
                o.u, o.v, o.a, saved
            )

        o.post_time_advance()
        return t + dt

    # -------- fixed-point (FSI) trio, ode.cpp:81-187 --------
    def fixed_point_solve2(self, t: float, dt: float) -> None:
        o = self.oper
        if self.nstate == 0:
            o.a = o.explicit_accel(o.u, o.v)
            self.nstate = 1
            self.aa = jnp.zeros_like(o.a)

        if self._fp_predict:
            self.va = o.v + self.fac0 * dt * o.a
            self.xa = o.u + self.fac1 * dt * self.va
            self.va = o.v + self.fac2 * dt * o.a
            self._fp_predict = False
            if self.dynamic_dirichlet is not None:
                self.xa, self.va, self.aa, self._fp_saved = (
                    self.dynamic_dirichlet.apply(
                        t, dt, o.u, o.v, o.a, self.xa, self.va, self.aa
                    )
                )

        o.dt = dt
        self.aa = o.implicit_solve(
            self.fac3 * dt * dt, self.fac4 * dt, self.xa, self.va, self.aa
        )

    def fixed_point_advance2(self, t: float, dt: float):
        """Non-committing preview: returns (x, v) advanced copies."""
        if self._fp_predict:
            raise RuntimeError(
                "FixedPointAdvance2() should be called after "
                "FixedPointSolve2()"
            )
        o = self.oper
        prev_fac = 1.0 - self.fac1_inv
        fac3dtdt = self.fac3 * dt * dt
        fac4dt = self.fac4 * dt
        x = o.u * prev_fac + self.fac1_inv * (self.xa + fac3dtdt * self.aa)
        v = o.v * prev_fac + self.fac1_inv * (self.va + fac4dt * self.aa)
        if self.dynamic_dirichlet is not None:
            x, v, _ = self.dynamic_dirichlet.restore(
                x, v, o.a, self._fp_saved
            )
        return x, v

    def advance_time2(self, t: float, dt: float) -> float:
        o = self.oper
        prev_fac = 1.0 - self.fac1_inv
        fac3dtdt = self.fac3 * dt * dt
        fac4dt = self.fac4 * dt
        xa = self.xa + fac3dtdt * self.aa
        va = self.va + fac4dt * self.aa
        o.u = o.u * prev_fac + self.fac1_inv * xa
        o.v = o.v * prev_fac + self.fac1_inv * va
        o.a = o.a * prev_fac + self.fac5_inv * self.aa
        self._fp_predict = True
        if self.dynamic_dirichlet is not None:
            o.u, o.v, o.a = self.dynamic_dirichlet.restore(
                o.u, o.v, o.a, self._fp_saved
            )
        o.post_time_advance()
        return t + dt


class AverageAcceleration(GeneralizedAlpha2):
    def __init__(self, oper):
        self.alpha_m = 0.5
        self.alpha_f = 0.5
        self.beta = 0.25
        self.gamma = 0.5
        self._init(oper)

    def name(self):
        return "AverageAcceleration"


class HHTAlpha(GeneralizedAlpha2):
    def __init__(self, oper, alpha: float = 1.0):
        alpha = min(max(alpha, 2.0 / 3.0), 1.0)
        self.alpha_m = 1.0
        self.alpha_f = alpha
        self.beta = (2.0 - alpha) ** 2 / 4.0
        self.gamma = 0.5 + self.alpha_m - self.alpha_f
        self._init(oper)

    def name(self):
        return "HHTAlpha"


class WBZAlpha(GeneralizedAlpha2):
    def __init__(self, oper, rho_inf: float = 1.0):
        rho_inf = min(max(rho_inf, 0.0), 1.0)
        self.alpha_f = 1.0
        self.alpha_m = 2.0 / (1.0 + rho_inf)
        self.beta = 0.25 * (1.0 + self.alpha_m - self.alpha_f) ** 2
        self.gamma = 0.5 + self.alpha_m - self.alpha_f
        self._init(oper)

    def name(self):
        return "WBZAlpha"


class Newmark:
    def __init__(self, oper, beta: float = 0.25, gamma: float = 0.5):
        self.oper = oper
        self.beta = beta
        self.gamma = gamma
        self.fac0 = 0.5 - beta
        self.fac2 = 1.0 - gamma
        self.fac3 = beta
        self.fac4 = gamma
        self.first = True
        self.dynamic_dirichlet = None
        self.xn = None
        self.vn = None
        self.aa = None

    def name(self):
        return "Newmark"

    def step_time2(self, t: float, dt: float) -> float:
        o = self.oper
        o.dt = dt
        if self.first:
            o.a = o.explicit_accel(o.u, o.v)
            self.first = False
        x = o.u + dt * o.v + self.fac0 * dt * dt * o.a
        v = o.v + self.fac2 * dt * o.a
        a = o.implicit_solve(self.fac3 * dt * dt, self.fac4 * dt, x, v, o.a)
        o.u = x + self.fac3 * dt * dt * a
        o.v = v + self.fac4 * dt * a
        o.a = a
        o.post_time_advance()
        return t + dt

    def fixed_point_solve2(self, t: float, dt: float) -> None:
        o = self.oper
        if self.first:
            o.a = o.explicit_accel(o.u, o.v)
            self.first = False
        o.dt = dt
        self.xn = o.u + dt * o.v + self.fac0 * dt * dt * o.a
        self.vn = o.v + self.fac2 * dt * o.a
        o.a = o.implicit_solve(
            self.fac3 * dt * dt, self.fac4 * dt, self.xn, self.vn, o.a
        )

    def fixed_point_advance2(self, t: float, dt: float):
        o = self.oper
        x = o.u + self.fac3 * dt * dt * o.a
        v = o.v + self.fac4 * dt * o.a
        return x, v

    def advance_time2(self, t: float, dt: float) -> float:
        o = self.oper
        o.u = self.xn + self.fac3 * dt * dt * o.a
        o.v = self.vn + self.fac4 * dt * o.a
        o.post_time_advance()
        return t + dt


class LinearAcceleration(Newmark):
    def __init__(self, oper):
        super().__init__(oper, 1.0 / 6.0, 0.5)


class CentralDifference(Newmark):
    def __init__(self, oper):
        super().__init__(oper, 0.0, 0.5)


class FoxGoodwin(Newmark):
    def __init__(self, oper):
        super().__init__(oper, 1.0 / 12.0, 0.5)
