"""Hardening laws as differentiable pure functions.

API parity with the reference bindings (py_hardening.cpp:11-83; models in
src/mimi/materials/material_hardening.hpp): attribute names `sigma_y`, `n`,
`eps0`, `A`, `B`, `C`, `eps0_dot`, `reference_temperature`, `m`, etc.

Each law exposes
  evaluate(eqps)            -> flow stress (differentiable in eqps)
  visco_evaluate(eqps, eqps_dot) -> flow stress x rate contribution
                               (rate-dependent laws only; the reference's
                               two-arg Evaluate, py_hardening.cpp:35-40)
  rate_contribution(rate)   -> scalar multiplier (treated piecewise)
  thermo_contribution(T)    -> scalar multiplier
  sigma_y()                 -> initial yield (HardeningBase::SigmaY,
                               py_hardening.cpp:28; on PowerLaw/Voce the
                               `sigma_y` data attribute shadows the method,
                               exactly the pybind-visible surface)
The reference's forward-AD scalar is replaced by jax.grad.
"""

from __future__ import annotations

import jax.numpy as jnp


class Hardening:
    def name(self):
        return type(self).__name__

    def is_rate_dependent(self):
        return False

    def is_temperature_dependent(self):
        return False

    def initialize_temperature(self, initial, melting):
        pass

    def validate(self):
        pass

    def rate_contribution(self, rate):
        return jnp.asarray(1.0)

    def thermo_contribution(self, temperature):
        return jnp.asarray(1.0)

    def evaluate(self, eqps):
        raise NotImplementedError

    def visco_evaluate(self, eqps, eqps_dot):
        """Rate-dependent flow stress (the reference's two-argument
        Evaluate, material_hardening.hpp:184-191): raises on
        rate-independent laws exactly like HardeningBase's."""
        raise NotImplementedError(
            f"{self.name()}: visco_evaluate needs a rate-dependent law"
        )

    def sigma_y(self):
        """Initial yield stress (HardeningBase::SigmaY). PowerLaw/Voce
        shadow this method with their `sigma_y` data attribute, matching
        the reference's pybind surface (py_hardening.cpp:28,47,54)."""
        return self.sigma_y_value()

    def sigma_y_value(self):
        """Initial yield stress (HardeningBase::SigmaY), used for solver
        tolerances."""
        raise NotImplementedError


class PowerLawHardening(Hardening):
    def __init__(self):
        # zero-initialized like the reference's value-initialized members
        self.sigma_y = 0.0
        self.n = 0.0
        self.eps0 = 0.0

    def evaluate(self, eqps):
        return self.sigma_y * (1.0 + eqps / self.eps0) ** (1.0 / self.n)

    def sigma_y_value(self):
        return self.sigma_y


class VoceHardening(Hardening):
    def __init__(self):
        self.sigma_y = 0.0
        self.sigma_sat = 0.0
        self.strain_constant = 0.0

    def evaluate(self, eqps):
        return self.sigma_sat - (self.sigma_sat - self.sigma_y) * jnp.exp(
            -eqps / self.strain_constant
        )

    def sigma_y_value(self):
        return self.sigma_y


class JohnsonCookHardening(Hardening):
    def __init__(self):
        self.A = 0.0
        self.B = 0.0
        self.n = 0.0

    def evaluate(self, eqps):
        # guard: A for |eqps| < 1e-13 (material_hardening.hpp JC::Evaluate),
        # double-where keeps the gradient NaN-free at eqps == 0.
        small = jnp.abs(eqps) < 1.0e-13
        safe = jnp.where(small, 1.0, eqps)
        return jnp.where(small, self.A, self.A + self.B * safe**self.n)

    def sigma_y_value(self):
        return self.A


class JohnsonCookRateDependentHardening(JohnsonCookHardening):
    def __init__(self):
        super().__init__()
        self.C = 0.0
        self.eps0_dot = 0.0  # effective_plastic_strain_rate_

    def is_rate_dependent(self):
        return True

    def visco_evaluate(self, eqps, eqps_dot):
        # material_hardening.hpp:186-191 — Evaluate(eqps) * RateContribution
        return self.evaluate(eqps) * self.rate_contribution(eqps_dot)

    def rate_contribution(self, rate):
        active = rate > self.eps0_dot
        safe = jnp.where(active, rate, self.eps0_dot)
        return jnp.where(
            active, 1.0 + self.C * jnp.log(safe / self.eps0_dot), 1.0
        )


class JohnsonCookTemperatureAndRateDependentHardening(
    JohnsonCookRateDependentHardening
):
    def __init__(self):
        super().__init__()
        self.reference_temperature = 0.0
        self.melting_temperature = 0.0
        self.m = 0.0

    def is_temperature_dependent(self):
        return True

    def initialize_temperature(self, initial, melting):
        self.melting_temperature = melting

    def validate(self):
        if self.reference_temperature > self.melting_temperature:
            raise ValueError(
                "reference temperature can't be bigger than melting "
                "temperature."
            )

    def thermo_contribution(self, temperature):
        t_ref = self.reference_temperature
        t_mel = self.melting_temperature
        theta = (temperature - t_ref) / (t_mel - t_ref)
        contrib = jnp.where(
            temperature < t_ref,
            1.0,
            jnp.where(
                temperature > t_mel,
                0.0,
                1.0 - jnp.maximum(theta, 0.0) ** self.m,
            ),
        )
        return contrib


class JohnsonCookViscoConstantTemperatureHardening(
    JohnsonCookTemperatureAndRateDependentHardening
):
    """Constant-temperature JC (py_hardening.cpp binds this as
    JohnsonCookViscoConstantTemperatureHardening)."""

    def __init__(self):
        super().__init__()
        self.temperature = -1.0
        self._temperature_contribution = -1.0

    def is_temperature_dependent(self):
        return False

    def initialize_temperature(self, initial, melting):
        self.melting_temperature = melting
        self.set_temperature(initial)

    def set_temperature(self, temp):
        self.temperature = temp
        val = 1.0 - (
            (temp - self.reference_temperature)
            / (self.melting_temperature - self.reference_temperature)
        ) ** self.m
        if val <= 0.0:
            raise ValueError(f"Invalid temperature contribution {val}")
        self._temperature_contribution = val

    def thermo_contribution(self, temperature):
        return jnp.asarray(self._temperature_contribution)
