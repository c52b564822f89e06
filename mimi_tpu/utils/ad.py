"""Forward-AD scalar convenience (`PyAD` parity).

The reference exposes its C++ forward-AD scalar to Python
(src/mimi/py/py_ad.cpp:14-44) mainly for experimenting with hardening
laws.  Here the same concept is a thin wrapper over jax.jvp: `AD(x)`
carries a value and derivative seed through arithmetic, powered by the
same machinery the solver itself uses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


class AD:
    """Scalar with a first derivative, closed under arithmetic."""

    def __init__(self, value, derivative=0.0):
        self.v = jnp.asarray(value, dtype=float)
        self.d = jnp.asarray(derivative, dtype=float)

    @staticmethod
    def variable(value):
        """Seed: d/dx x = 1."""
        return AD(value, 1.0)

    def _lift(self, other):
        return other if isinstance(other, AD) else AD(other, 0.0)

    def __add__(self, o):
        o = self._lift(o)
        return AD(self.v + o.v, self.d + o.d)

    __radd__ = __add__

    def __sub__(self, o):
        o = self._lift(o)
        return AD(self.v - o.v, self.d - o.d)

    def __rsub__(self, o):
        return self._lift(o).__sub__(self)

    def __mul__(self, o):
        o = self._lift(o)
        return AD(self.v * o.v, self.d * o.v + self.v * o.d)

    __rmul__ = __mul__

    def __truediv__(self, o):
        o = self._lift(o)
        return AD(self.v / o.v, (self.d * o.v - self.v * o.d) / (o.v * o.v))

    def __rtruediv__(self, o):
        return self._lift(o).__truediv__(self)

    def __pow__(self, p):
        return AD(
            self.v**p, p * self.v ** (p - 1) * self.d
        )

    def __neg__(self):
        return AD(-self.v, -self.d)

    def sqrt(self):
        r = jnp.sqrt(self.v)
        return AD(r, 0.5 / r * self.d)

    def exp(self):
        e = jnp.exp(self.v)
        return AD(e, e * self.d)

    def log(self):
        return AD(jnp.log(self.v), self.d / self.v)

    # reference accessors (py_ad.cpp)
    def get_value(self):
        return float(self.v)

    def get_derivatives(self, i=0):
        return float(self.d)

    def __repr__(self):
        return f"AD(v={float(self.v)}, d={float(self.d)})"


def derivative(f, x):
    """d f / d x at x via jax (the native replacement for building AD
    expressions by hand)."""
    return float(jax.grad(lambda t: jnp.asarray(f(t), float))(jnp.asarray(x, float)))
