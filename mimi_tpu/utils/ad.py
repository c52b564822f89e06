"""Forward-AD scalar/vector convenience (`PyAD` / `PyADVec` parity).

The reference exposes its C++ forward-AD types to Python
(src/mimi/py/py_ad.cpp:14-44): `PyAD(value, n_derivatives)` with
`v()`, `d()` (derivative vector), `activate(i)` (seed component i), the
full arithmetic operator set, and `PyADVec(n)` — a vector of AD scalars
with identity seeding (ad.hpp:477-603).  Here the same surface is a thin
numpy-vector forward-mode implementation; the solver itself uses jax AD
(jacfwd/jvp), this wrapper exists for API parity and experimenting with
hardening laws from Python.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


class AD:
    """Scalar with an n-component derivative vector, closed under
    arithmetic (ADScalar<double, 0> analog)."""

    def __init__(self, value, n_derivatives=1):
        self.v_ = float(value)
        if isinstance(n_derivatives, (int, np.integer)):
            self.d_ = np.zeros(max(int(n_derivatives), 1))
        else:  # direct derivative seed (scalar or vector)
            self.d_ = np.atleast_1d(
                np.asarray(n_derivatives, dtype=float)
            ).copy()

    @staticmethod
    def variable(value):
        """Single-direction seed: d/dx x = 1."""
        return AD(value, [1.0])

    # reference accessors (py_ad.cpp:26-31)
    def v(self):
        return self.v_

    def d(self):
        return self.d_.copy()

    def activate(self, i):
        """SetActiveComponent: seed derivative component i to 1."""
        self.d_[:] = 0.0
        self.d_[i] = 1.0
        return self

    def _lift(self, other):
        if isinstance(other, AD):
            return other
        o = AD(other, len(self.d_))
        return o

    def _new(self, v, d):
        out = AD.__new__(AD)
        out.v_ = float(v)
        out.d_ = np.asarray(d, dtype=float)
        return out

    def __add__(self, o):
        o = self._lift(o)
        return self._new(self.v_ + o.v_, self.d_ + o.d_)

    __radd__ = __add__

    def __sub__(self, o):
        o = self._lift(o)
        return self._new(self.v_ - o.v_, self.d_ - o.d_)

    def __rsub__(self, o):
        return self._lift(o).__sub__(self)

    def __mul__(self, o):
        o = self._lift(o)
        return self._new(
            self.v_ * o.v_, self.d_ * o.v_ + self.v_ * o.d_
        )

    __rmul__ = __mul__

    def __truediv__(self, o):
        o = self._lift(o)
        return self._new(
            self.v_ / o.v_,
            (self.d_ * o.v_ - self.v_ * o.d_) / (o.v_ * o.v_),
        )

    def __rtruediv__(self, o):
        return self._lift(o).__truediv__(self)

    def __pow__(self, p):
        return self._new(
            self.v_**p, p * self.v_ ** (p - 1) * self.d_
        )

    def __neg__(self):
        return self._new(-self.v_, -self.d_)

    # comparisons on values (ad.hpp comparison set)
    def __lt__(self, o):
        return self.v_ < (o.v_ if isinstance(o, AD) else o)

    def __le__(self, o):
        return self.v_ <= (o.v_ if isinstance(o, AD) else o)

    def __gt__(self, o):
        return self.v_ > (o.v_ if isinstance(o, AD) else o)

    def __ge__(self, o):
        return self.v_ >= (o.v_ if isinstance(o, AD) else o)

    def sqrt(self):
        r = np.sqrt(self.v_)
        return self._new(r, 0.5 / r * self.d_)

    def exp(self):
        e = np.exp(self.v_)
        return self._new(e, e * self.d_)

    def log(self):
        return self._new(np.log(self.v_), self.d_ / self.v_)

    # back-compat accessors
    def get_value(self):
        return self.v_

    def get_derivatives(self, i=0):
        return float(self.d_[i])

    def __repr__(self):
        return f"AD(v={self.v_}, d={self.d_.tolist()})"


class ADVec:
    """Vector of AD scalars with identity seeding (ADVector<0>,
    ad.hpp:477-603): component i carries derivative e_i, so any scalar
    expression of the components exposes its full gradient."""

    def __init__(self, values):
        if isinstance(values, (int, np.integer)):
            values = np.zeros(int(values))
        values = np.asarray(values, dtype=float).ravel()
        n = len(values)
        self._entries = []
        for i, v in enumerate(values):
            a = AD(v, n)
            a.activate(i)
            self._entries.append(a)

    def __len__(self):
        return len(self._entries)

    def __getitem__(self, i):
        return self._entries[i]

    def __setitem__(self, i, value):
        n = len(self._entries)
        if isinstance(value, AD):
            self._entries[i] = value
        else:
            a = AD(value, n)
            a.activate(i)
            self._entries[i] = a

    def values(self):
        return np.array([a.v_ for a in self._entries])

    def __iter__(self):
        return iter(self._entries)

    def __repr__(self):
        return f"ADVec({self.values().tolist()})"


def derivative(f, x):
    """d f / d x at x via jax (the native replacement for building AD
    expressions by hand)."""
    return float(jax.grad(lambda t: jnp.asarray(f(t), float))(jnp.asarray(x, float)))
