"""Material models as differentiable pure functions over the deformation
gradient plus per-quad-point state.

Parity with /root/reference/src/mimi/materials/materials.{hpp,cpp}:
 - StVenantKirchhoff           P = F (lambda tr(E) I + 2 mu E)
 - CompressibleOgdenNeoHookean sigma = mu/J (B - I) + lambda (J - 1) I
 - J2Linear   small-strain J2, linear iso+kinematic hardening, closed form
 - J2         small-strain J2, nonlinear isotropic hardening (scalar solve)
 - J2Simo     finite strain, multiplicative split on elastic left CG
 - J2Log      finite strain in logarithmic (Hencky) strain space

Python attribute names mirror the pybind API (py_material.cpp:18-79):
density, viscosity, set_young_poisson, set_lame, hardening, heat_fraction,
specific_heat, initial_temperature, melting_temperature, ...

The reference's template<bool accumulate> PlasticStress becomes two pure
functions sharing one implementation: `pk1(F, state, dt) -> P` (stress, no
state mutation) and `accumulate(F, state, dt) -> state'` (converged-step
state update, run from PostTimeAdvance).  The reference's per-quad forward
finite-difference tangents (nonlinear_solid.cpp:48-76) are replaced by
jax.jacfwd through these functions; the radial-return scalar solve carries
an implicit-function-theorem JVP (scalar_solve.py).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .hardening import Hardening  # noqa: F401
from .logm import expm_sym, logm_sym, expm_sym_soa, logm_sym_soa
from .scalar_solve import make_scalar_solver
from .tensor import dev, elastic_strain, fro_norm, det_small, inv_small
from ..fem import soa

_K_TOL = 1.0e-10

# Pallas-kernel tracing mode: Mosaic cannot legalize lax.while_loop, so
# inside fused sweep kernels (ops/sweeps.py) the radial-return scalar
# solve switches to a fixed-trip fori variant, gated behind an
# any-active lax.cond so fully elastic element blocks skip it.
import contextlib

_KERNEL_SOLVE = {"on": False}


@contextlib.contextmanager
def kernel_solver_mode():
    old = _KERNEL_SOLVE["on"]
    _KERNEL_SOLVE["on"] = True
    try:
        yield
    finally:
        _KERNEL_SOLVE["on"] = old


class Material:
    """Base: parameter store + elastic-constant conversions
    (materials.cpp:7-23)."""

    # dP/dF has major symmetry (hyperelastic energy Hessian): enables
    # the 45-plane symmetric tangent storage in the pallas matvec
    # (ops/sweeps.py).  Measured round 4 (docs/ROADMAP.md): NeoHookean/
    # StVK symmetric to 3e-16; the J2 family asymmetric by 2-16%
    # (Cauchy->PK1 geometric terms), so it stays False there.
    tangent_major_symmetric = False
    # Cauchy-decomposition tangent storage (VERDICT r4 #3): True when
    # the material exposes `cauchy_soa` with sigma SYMMETRIC and a
    # function of F only through sym(F) (small-strain measures), so
    #   dP = tr(F^-1 dF) P + J (M : sym dF) F^-T - P dF^T F^-T
    # holds EXACTLY with M = d sigma/d eps the (Voigt-symmetric)
    # material tangent.  The pallas matvec then streams M's 21 planes
    # + sigma (6) + F^-1 (9) + J (1) = 37 instead of the 81-plane dP/dF
    # (ops/sweeps.py c_storage="cauchy") and applies the geometric
    # transform per-qp in VMEM.  The radial-return consistent tangent
    # of associated J2 with isotropic(+kinematic) hardening is
    # major-symmetric (built from I, I(x)I and N(x)N), pinned by
    # tests/test_pallas.py.
    tangent_cauchy_decomp = False

    def __init__(self):
        self.density = -1.0
        self.viscosity = -1.0
        self.lambda_ = -1.0
        self.mu = -1.0
        self.young = -1.0
        self.poisson = -1.0
        self.K = -1.0
        self.G = -1.0

    def name(self):
        return type(self).__name__

    def set_young_poisson(self, young, poisson):
        self.young = young
        self.poisson = poisson
        self.lambda_ = young * poisson / ((1 + poisson) * (1 - 2 * poisson))
        self.mu = young / (2.0 * (1.0 + poisson))
        self.G = self.mu
        self.K = young / (3.0 * (1.0 - 2.0 * poisson))

    def set_lame(self, lam, mu):
        self.young = mu * (3 * lam + 2 * mu) / (lam + mu)
        self.poisson = lam / (2 * (lam + mu))
        self.lambda_ = lam
        self.mu = mu
        self.G = mu
        self.K = lam + 2 * mu / 3

    # -- interface consumed by the assembly layer --
    has_state = False
    # SoA fast path: pk1_soa/accumulate_soa take F as (dim, dim, *batch)
    # (fem/soa.py layout contract) and state leaves with tensor dims
    # leading; the compiled core (parallel/sharding.py) uses them to keep
    # every intermediate batch-last on TPU.
    has_soa = False

    def setup(self, dim):
        self.dim = dim

    def init_state(self, shape_prefix):
        return None

    def pk1(self, F, state, dt):
        raise NotImplementedError

    def accumulate(self, F, state, dt):
        return state

    def pk1_soa(self, F, state, dt):
        raise NotImplementedError(f"{self.name()} has no SoA fast path")

    def accumulate_soa(self, F, state, dt):
        return state


def _pk1_from_cauchy(sigma, F):
    """P = det(F) sigma F^{-T} (materials.cpp:60-71)."""
    J = det_small(F)
    return J * sigma @ inv_small(F).T


def _pk1_from_cauchy_soa(sigma, F):
    """SoA layout: P = det(F) sigma F^{-T}."""
    J = soa.det(F)
    return J * soa.matmul_nt(sigma, soa.inv(F))


class StVenantKirchhoff(Material):
    has_soa = True
    tangent_major_symmetric = True  # P = F S(E): d2W/dF2 Hessian

    def pk1(self, F, state, dt):
        d = F.shape[-1]
        I = jnp.eye(d, dtype=F.dtype)
        E = 0.5 * (F.T @ F - I)
        S = self.lambda_ * jnp.trace(E) * I + 2.0 * self.mu * E
        return F @ S

    def pk1_soa(self, F, state, dt):
        E = 0.5 * soa.add_diag(soa.matmul_tn(F, F), -1.0)
        S = soa.add_diag(2.0 * self.mu * E, self.lambda_ * soa.trace(E))
        return soa.matmul(F, S)


class CompressibleOgdenNeoHookean(Material):
    has_soa = True
    tangent_major_symmetric = True  # hyperelastic energy Hessian

    def pk1(self, F, state, dt):
        d = F.shape[-1]
        I = jnp.eye(d, dtype=F.dtype)
        J = det_small(F)
        B = F @ F.T
        mu_over_J = self.mu / J
        sigma = mu_over_J * B + (-mu_over_J + self.lambda_ * (J - 1.0)) * I
        return _pk1_from_cauchy(sigma, F)

    def pk1_soa(self, F, state, dt):
        J = soa.det(F)
        B = soa.matmul_nt(F, F)
        mu_over_J = self.mu / J
        sigma = soa.add_diag(
            mu_over_J * B, -mu_over_J + self.lambda_ * (J - 1.0)
        )
        return _pk1_from_cauchy_soa(sigma, F)


class J2Linear(Material):
    """Small-strain J2 with linear isotropic + kinematic hardening
    (materials.hpp:142-249, "Computational Methods for Plasticity" box 7.5)."""

    has_state = True
    tangent_cauchy_decomp = True  # sigma = sigma(sym F), symmetric

    def __init__(self):
        super().__init__()
        self.isotropic_hardening = 0.0
        self.kinematic_hardening = 0.0
        self.sigma_y = 0.0

    def init_state(self, shape_prefix):
        d = self.dim
        z = jnp.zeros((*shape_prefix, d, d))
        return {
            "plastic_strain": z,
            "beta": z,
            "eqps": jnp.zeros(shape_prefix),
        }

    def _common(self, F, state):
        G, K = self.G, self.K
        eps = elastic_strain(F, state["plastic_strain"])
        p = K * jnp.trace(eps)
        s = dev(eps, 2.0 * G)
        eta = s - state["beta"]
        eta_norm = fro_norm(eta)
        q = jnp.sqrt(1.5) * eta_norm
        phi = q - (self.sigma_y + self.isotropic_hardening * state["eqps"])
        denom = 3.0 * G + self.kinematic_hardening + self.isotropic_hardening
        dps = jnp.where(phi > 0.0, phi / denom, 0.0)
        eta_hat = eta / jnp.where(eta_norm > 0.0, eta_norm, 1.0)
        return p, s, eta_hat, dps

    def pk1(self, F, state, dt):
        d = F.shape[-1]
        p, s, eta_hat, dps = self._common(F, state)
        s = s - jnp.sqrt(6.0) * self.G * dps * eta_hat
        sigma = s + p * jnp.eye(d, dtype=F.dtype)
        return _pk1_from_cauchy(sigma, F)

    def accumulate(self, F, state, dt):
        _, _, eta_hat, dps = self._common(F, state)
        return {
            "plastic_strain": state["plastic_strain"]
            + jnp.sqrt(1.5) * dps * eta_hat,
            "beta": state["beta"]
            + jnp.sqrt(2.0 / 3.0) * self.kinematic_hardening * dps * eta_hat,
            "eqps": state["eqps"] + dps,
        }

    has_soa = True

    def _common_soa(self, F, state):
        G = self.G
        eps = soa.add_diag(soa.sym(F) - state["plastic_strain"], -1.0)
        p = self.K * soa.trace(eps)
        s = soa.dev(eps, 2.0 * G)
        eta = s - state["beta"]
        eta_norm = soa.fro_norm(eta)
        q = jnp.sqrt(1.5) * eta_norm
        phi = q - (self.sigma_y + self.isotropic_hardening * state["eqps"])
        denom = 3.0 * G + self.kinematic_hardening + self.isotropic_hardening
        dps = jnp.where(phi > 0.0, phi / denom, 0.0)
        eta_hat = eta / jnp.where(eta_norm > 0.0, eta_norm, 1.0)
        return p, s, eta_hat, dps

    def cauchy_soa(self, F, state, dt):
        p, s, eta_hat, dps = self._common_soa(F, state)
        s = s - jnp.sqrt(6.0) * self.G * dps * eta_hat
        return soa.add_diag(s, p)

    def pk1_soa(self, F, state, dt):
        return _pk1_from_cauchy_soa(self.cauchy_soa(F, state, dt), F)

    def accumulate_soa(self, F, state, dt):
        _, _, eta_hat, dps = self._common_soa(F, state)
        return {
            "plastic_strain": state["plastic_strain"]
            + jnp.sqrt(1.5) * dps * eta_hat,
            "beta": state["beta"]
            + jnp.sqrt(2.0 / 3.0) * self.kinematic_hardening * dps * eta_hat,
            "eqps": state["eqps"] + dps,
        }


class _J2ThermoBase(Material):
    """Shared parameters / scalar-solve machinery for J2, J2Simo, J2Log."""

    has_state = True

    def __init__(self):
        super().__init__()
        self.hardening: Hardening | None = None
        self.heat_fraction = 0.9
        self.specific_heat = -1.0
        self.initial_temperature = 20.0
        self.melting_temperature = -1.0

    def setup(self, dim):
        super().setup(dim)
        if self.hardening is None:
            raise RuntimeError(f"hardening missing for {self.name()}")
        self.hardening.initialize_temperature(
            self.initial_temperature, self.melting_temperature
        )
        self.hardening.validate()
        self._tolerance = self.hardening.sigma_y_value() * _K_TOL
        # residual(delta_eqps; q, eqps_old, thermo, dt, slope)
        # slope = 3G (J2/J2Log) or G*tr(be) (J2Simo)
        hard = self.hardening

        def residual(delta, q, eqps_old, thermo, dt, slope):
            return q - slope * delta - hard.evaluate(eqps_old + delta) * (
                hard.rate_contribution(delta / dt) * thermo
            )

        self._residual = residual
        self._solver = make_scalar_solver(residual, _K_TOL, None, 100)
        # fixed-trip variant for Pallas kernels (while_loop does not
        # legalize in Mosaic); 40 bisection-safeguarded trips shrink the
        # bracket past f32 resolution
        self._solver_fori = make_scalar_solver(
            residual, _K_TOL, None, 40, loop="fori"
        )

    def _solve_delta_eqps(self, q, eqps_old, thermo, dt, slope):
        """Masked radial-return solve: active where residual(0) > tol.

        The bracketed Newton-bisection solve itself runs outside AD (all
        inputs stop_gradient'ed); exact sensitivities are re-injected with
        one implicit-function-theorem Newton correction
            delta = delta* - r(delta*, theta)/r'(delta*)
        whose value equals delta* (r ~ 0 there) and whose JVP equals the
        IFT derivative.  This keeps jacfwd element tangents from replaying
        the iterative solve once per tangent direction — the single
        biggest compile/runtime cost otherwise.
        """
        import jax

        hard = self.hardening
        sg = jax.lax.stop_gradient
        r0 = self._residual(0.0, q, eqps_old, thermo, dt, slope)
        active = r0 > self._tolerance
        eval0 = hard.evaluate(eqps_old)
        ub_raw = (q - eval0 * thermo) / slope
        # benign substitute problem for inactive lanes (result discarded):
        # q = eval0*thermo makes residual(0) == 0, so inactive lanes
        # converge on the solver's first check instead of iterating — in
        # the batched (SoA) regime the while_loop runs until the slowest
        # lane converges, so elastic lanes must be instant
        q_safe = jnp.where(active, q, eval0 * thermo)
        ub = jnp.where(active, ub_raw, 1.0)
        theta_ng = tuple(
            sg(x) for x in (q_safe, eqps_old, thermo, dt, slope)
        )
        if _KERNEL_SOLVE["on"]:
            # fixed-trip solve behind an any-active cond: fully elastic
            # blocks skip the 40-trip loop entirely
            ub_ng = sg(ub)
            d_star = sg(
                jax.lax.cond(
                    jnp.any(active),
                    lambda: self._solver_fori(
                        0.0, 0.0, ub_ng, self._tolerance, theta_ng
                    ),
                    lambda: jnp.zeros_like(ub_ng),
                )
            )
        else:
            d_star = sg(
                self._solver(0.0, 0.0, sg(ub), self._tolerance, theta_ng)
            )
        # differentiable re-injection (theta with gradients)
        fval = self._residual(d_star, q_safe, eqps_old, thermo, dt, slope)
        # elementwise d(residual)/d(delta) via jvp (batch-polymorphic;
        # jax.grad would require a scalar output)
        _, fprime_raw = jax.jvp(
            lambda x: self._residual(x, *theta_ng),
            (d_star,),
            (jnp.ones_like(d_star),),
        )
        fprime = sg(fprime_raw)
        delta = d_star - fval / fprime
        return jnp.where(active, delta, 0.0), active


class J2(_J2ThermoBase):
    """Small-strain J2, nonlinear isotropic hardening
    (materials.hpp:260-404)."""

    tangent_cauchy_decomp = True  # sigma = sigma(sym F), symmetric

    def init_state(self, shape_prefix):
        d = self.dim
        return {
            "plastic_strain": jnp.zeros((*shape_prefix, d, d)),
            "eqps": jnp.zeros(shape_prefix),
            "temperature": jnp.full(shape_prefix, self.initial_temperature),
        }

    def _trial(self, F, state):
        eps = elastic_strain(F, state["plastic_strain"])
        p = self.K * jnp.trace(eps)
        s = dev(eps, 2.0 * self.G)
        q = jnp.sqrt(1.5) * fro_norm(s)
        return p, s, q

    def pk1(self, F, state, dt):
        d = F.shape[-1]
        p, s, q = self._trial(F, state)
        thermo = self.hardening.thermo_contribution(state["temperature"])
        delta, active = self._solve_delta_eqps(
            q, state["eqps"], thermo, dt, 3.0 * self.G
        )
        N_p = (1.5 / jnp.where(q > 0.0, q, 1.0)) * s
        s = s - 2.0 * self.G * delta * N_p
        sigma = s + p * jnp.eye(d, dtype=F.dtype)
        return _pk1_from_cauchy(sigma, F)

    def accumulate(self, F, state, dt):
        p, s, q = self._trial(F, state)
        thermo = self.hardening.thermo_contribution(state["temperature"])
        delta, active = self._solve_delta_eqps(
            q, state["eqps"], thermo, dt, 3.0 * self.G
        )
        N_p = (1.5 / jnp.where(q > 0.0, q, 1.0)) * s
        new = dict(state)
        new["eqps"] = state["eqps"] + delta
        new["plastic_strain"] = state["plastic_strain"] + delta * N_p
        if self.hardening.is_temperature_dependent():
            new["temperature"] = state["temperature"] + jnp.where(
                active,
                self.heat_fraction
                * q
                * delta
                / (self.density * self.specific_heat),
                0.0,
            )
        return new

    has_soa = True

    def _trial_soa(self, F, state):
        eps = soa.add_diag(
            soa.sym(F) - state["plastic_strain"], -1.0
        )
        p = self.K * soa.trace(eps)
        s = soa.dev(eps, 2.0 * self.G)
        q = jnp.sqrt(1.5) * soa.fro_norm(s)
        return p, s, q

    def cauchy_soa(self, F, state, dt):
        p, s, q = self._trial_soa(F, state)
        thermo = self.hardening.thermo_contribution(state["temperature"])
        delta, active = self._solve_delta_eqps(
            q, state["eqps"], thermo, dt, 3.0 * self.G
        )
        N_p = (1.5 / jnp.where(q > 0.0, q, 1.0)) * s
        s = s - 2.0 * self.G * delta * N_p
        return soa.add_diag(s, p)

    def pk1_soa(self, F, state, dt):
        return _pk1_from_cauchy_soa(self.cauchy_soa(F, state, dt), F)

    def accumulate_soa(self, F, state, dt):
        p, s, q = self._trial_soa(F, state)
        thermo = self.hardening.thermo_contribution(state["temperature"])
        delta, active = self._solve_delta_eqps(
            q, state["eqps"], thermo, dt, 3.0 * self.G
        )
        N_p = (1.5 / jnp.where(q > 0.0, q, 1.0)) * s
        new = dict(state)
        new["eqps"] = state["eqps"] + delta
        new["plastic_strain"] = state["plastic_strain"] + delta * N_p
        if self.hardening.is_temperature_dependent():
            new["temperature"] = state["temperature"] + jnp.where(
                active,
                self.heat_fraction
                * q
                * delta
                / (self.density * self.specific_heat),
                0.0,
            )
        return new


class J2Simo(_J2ThermoBase):
    """Finite-strain J2 (Simo), multiplicative split with elastic left
    Cauchy-Green trial push-forward (materials.hpp:406-579)."""

    def init_state(self, shape_prefix):
        d = self.dim
        eye = jnp.broadcast_to(jnp.eye(d), (*shape_prefix, d, d))
        return {
            "be_old": eye,
            "F_old": eye,
            "eqps": jnp.zeros(shape_prefix),
            "temperature": jnp.full(shape_prefix, self.initial_temperature),
        }

    def _trial(self, F, state):
        d = F.shape[-1]
        # f = F F_old^{-1};  f_bar = f * cbrt(det f)  — exactly as the
        # reference computes it (materials.hpp:484-486: CalcInverse then
        # `f_bar *= cbrt(f_bar.Det())`)
        f_inv = state["F_old"] @ inv_small(F)
        f_bar = inv_small(f_inv)
        f_bar = f_bar * jnp.cbrt(det_small(f_bar))
        be = f_bar @ state["be_old"] @ f_bar.T
        s = dev(be, self.G)
        s_norm = fro_norm(s)
        near_zero = s_norm < jnp.finfo(s.dtype).eps
        N_p = jnp.where(
            near_zero,
            jnp.sqrt(0.5) * jnp.eye(d, dtype=F.dtype),
            jnp.sqrt(1.5) / jnp.where(near_zero, 1.0, s_norm) * s,
        )
        q = jnp.sum(N_p * s)  # s_effective
        return be, s, N_p, q

    def _return_map(self, F, state, dt):
        be, s, N_p, q = self._trial(F, state)
        thermo = self.hardening.thermo_contribution(state["temperature"])
        be_trace = jnp.trace(be)
        delta, active = self._solve_delta_eqps(
            q, state["eqps"], thermo, dt, self.G * be_trace
        )
        be = be - (2.0 / 3.0) * delta * be_trace * N_p
        s = dev(be, self.G)
        return be, s, q, delta, active

    def pk1(self, F, state, dt):
        d = F.shape[-1]
        be, s, q, delta, active = self._return_map(F, state, dt)
        J = det_small(F)
        tau = s + self.K * (J * J - 1.0) * 0.5 * jnp.eye(d, dtype=F.dtype)
        return tau @ inv_small(F).T

    def accumulate(self, F, state, dt):
        be, s, q, delta, active = self._return_map(F, state, dt)
        new = dict(state)
        new["F_old"] = F
        new["be_old"] = be
        new["eqps"] = state["eqps"] + delta
        if self.hardening.is_temperature_dependent():
            new["temperature"] = state["temperature"] + jnp.where(
                active,
                self.heat_fraction
                * q
                * delta
                / (self.density * self.specific_heat),
                0.0,
            )
        return new

    has_soa = True

    def _trial_soa(self, F, state):
        d = F.shape[0]
        f_inv = soa.matmul(state["F_old"], soa.inv(F))
        f_bar = soa.inv(f_inv)
        f_bar = f_bar * jnp.cbrt(soa.det(f_bar))
        be = soa.matmul_nt(soa.matmul(f_bar, state["be_old"]), f_bar)
        s = soa.dev(be, self.G)
        s_norm = soa.fro_norm(s)
        near_zero = s_norm < jnp.finfo(s.dtype).eps
        s_hat = jnp.sqrt(1.5) / jnp.where(near_zero, 1.0, s_norm) * s
        N_p = soa.stack2(
            [
                [
                    jnp.where(
                        near_zero,
                        jnp.sqrt(0.5) if i == j else s_hat[i, j] * 0.0,
                        s_hat[i, j],
                    )
                    for j in range(d)
                ]
                for i in range(d)
            ]
        )
        q = soa.ddot(N_p, s)  # s_effective
        return be, s, N_p, q

    def _return_map_soa(self, F, state, dt):
        be, s, N_p, q = self._trial_soa(F, state)
        thermo = self.hardening.thermo_contribution(state["temperature"])
        be_trace = soa.trace(be)
        delta, active = self._solve_delta_eqps(
            q, state["eqps"], thermo, dt, self.G * be_trace
        )
        be = be - (2.0 / 3.0) * delta * be_trace * N_p
        s = soa.dev(be, self.G)
        return be, s, q, delta, active

    def pk1_soa(self, F, state, dt):
        be, s, q, delta, active = self._return_map_soa(F, state, dt)
        J = soa.det(F)
        tau = soa.add_diag(s, self.K * (J * J - 1.0) * 0.5)
        return soa.matmul_nt(tau, soa.inv(F))

    def accumulate_soa(self, F, state, dt):
        be, s, q, delta, active = self._return_map_soa(F, state, dt)
        new = dict(state)
        new["F_old"] = F
        new["be_old"] = be
        new["eqps"] = state["eqps"] + delta
        if self.hardening.is_temperature_dependent():
            new["temperature"] = state["temperature"] + jnp.where(
                active,
                self.heat_fraction
                * q
                * delta
                / (self.density * self.specific_heat),
                0.0,
            )
        return new


class J2Log(_J2ThermoBase):
    """Finite-strain J2 in logarithmic (Hencky) strain via symmetric
    eigendecomposition, exponential-map update of Fp^{-1}
    (materials.hpp:583-753).

    Stress note: through the reference's EvaluateCauchy->EvaluatePK1 call
    chain the final first Piola stress is
        P = det(F) * (s + p/det(F) I) F^{-T} = (det(F) s + p I) F^{-T}
    (PlasticStress writes M = s + p/J I into the matrix the base transform
    then converts, materials.hpp:724-734 + materials.cpp:60-71); we
    reproduce that exact expression.
    """

    def init_state(self, shape_prefix):
        d = self.dim
        eye = jnp.broadcast_to(jnp.eye(d), (*shape_prefix, d, d))
        return {
            "Fp_inv": eye,
            "eqps": jnp.zeros(shape_prefix),
            "temperature": jnp.full(shape_prefix, self.initial_temperature),
        }

    def _return_map(self, F, state, dt):
        F_e = F @ state["Fp_inv"]
        E_e = 0.5 * logm_sym(F_e.T @ F_e)
        p = self.K * jnp.trace(E_e)
        s = dev(E_e, 2.0 * self.G)
        q = jnp.sqrt(1.5) * fro_norm(s)
        thermo = self.hardening.thermo_contribution(state["temperature"])
        delta, active = self._solve_delta_eqps(
            q, state["eqps"], thermo, dt, 3.0 * self.G
        )
        N_p = (1.5 / jnp.where(q > 0.0, q, 1.0)) * s
        s = s - 2.0 * self.G * delta * N_p
        d = F.shape[-1]
        exp_inc = jnp.where(
            active,
            expm_sym(-delta * N_p),
            jnp.eye(d, dtype=F.dtype),
        )
        return p, s, q, delta, active, exp_inc

    def pk1(self, F, state, dt):
        d = F.shape[-1]
        p, s, q, delta, active, exp_inc = self._return_map(F, state, dt)
        J = det_small(F)
        M = s + (p / J) * jnp.eye(d, dtype=F.dtype)
        return J * M @ inv_small(F).T

    def accumulate(self, F, state, dt):
        p, s, q, delta, active, exp_inc = self._return_map(F, state, dt)
        new = dict(state)
        new["Fp_inv"] = state["Fp_inv"] @ exp_inc
        new["eqps"] = state["eqps"] + delta
        if self.hardening.is_temperature_dependent():
            new["temperature"] = state["temperature"] + jnp.where(
                active,
                self.heat_fraction
                * q
                * delta
                / (self.density * self.specific_heat),
                0.0,
            )
        return new

    # SoA fast path (round-3): the eigh-based Hencky strain has no
    # batch-last formulation, so log/exp come from the smooth
    # Denman-Beavers + Gregory / scaling-squaring iterations
    # (materials/logm.py `logm_sym_soa`/`expm_sym_soa`), which
    # differentiate cleanly under the compiled core's jax.linearize —
    # no eigen-degeneracy custom JVPs needed.
    has_soa = True

    def _return_map_soa(self, F, state, dt):
        F_e = soa.matmul(F, state["Fp_inv"])
        C_e = soa.matmul_tn(F_e, F_e)
        E_e = 0.5 * logm_sym_soa(C_e)
        p = self.K * soa.trace(E_e)
        s = soa.dev(E_e, 2.0 * self.G)
        q = jnp.sqrt(1.5) * soa.fro_norm(s)
        thermo = self.hardening.thermo_contribution(state["temperature"])
        delta, active = self._solve_delta_eqps(
            q, state["eqps"], thermo, dt, 3.0 * self.G
        )
        N_p = (1.5 / jnp.where(q > 0.0, q, 1.0)) * s
        s = s - 2.0 * self.G * delta * N_p
        return p, s, q, delta, active, N_p

    def pk1_soa(self, F, state, dt):
        p, s, q, delta, active, N_p = self._return_map_soa(F, state, dt)
        J = soa.det(F)
        M = soa.add_diag(s, p / J)
        return J * soa.matmul_nt(M, soa.inv(F))

    def accumulate_soa(self, F, state, dt):
        p, s, q, delta, active, N_p = self._return_map_soa(F, state, dt)
        # delta == 0 (hence N_p-increment == 0) on inactive points, so
        # expm(0) == I exactly replaces the eigh path's active mask
        exp_inc = expm_sym_soa(-delta * N_p)
        new = dict(state)
        new["Fp_inv"] = soa.matmul(state["Fp_inv"], exp_inc)
        new["eqps"] = state["eqps"] + delta
        if self.hardening.is_temperature_dependent():
            new["temperature"] = state["temperature"] + jnp.where(
                active,
                self.heat_fraction
                * q
                * delta
                / (self.density * self.specific_heat),
                0.0,
            )
        return new
