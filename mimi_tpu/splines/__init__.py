"""Minimal spline library (splinepy replacement for rigid contact bodies
and solver geometry export).

The reference delegates rigid-tool geometry to splinepy
(/root/reference/src/mimi/coefficients/nearest_distance.hpp:215-288); that
package is replaced here by a small JAX-evaluable spline core so that
closest-point projection can run vectorized on TPU.

`Bezier`, `BSpline`, `NURBS` store control points in lexicographic order
(first parametric index fastest), matching splinepy's layout, and support
in-place mutation of `.cps` (the examples move the rigid tool every step).
Evaluation is implemented as a jit-friendly pure function of (params, cps)
with static degrees/knots; derivatives come from jax.jacfwd.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _find_span_static(kv: np.ndarray, p: int, u):
    """Jittable find_span for a static knot vector: index of the span,
    clamped to [p, n-1]."""
    n = len(kv) - p - 1
    kvj = jnp.asarray(kv)
    span = jnp.searchsorted(kvj, u, side="right") - 1
    return jnp.clip(span, p, n - 1)


def _basis_static(kv: np.ndarray, p: int, span, u):
    """Nonzero basis functions at u for static (kv, p): shape (p+1,).
    Cox-de Boor with fixed trip count; differentiable in u."""
    kvj = jnp.asarray(kv)
    N = jnp.zeros(p + 1, dtype=jnp.result_type(u, 1.0)).at[0].set(1.0)
    for j in range(1, p + 1):
        left = u - kvj[span + 1 - j + jnp.arange(j)][::-1]  # left[1..j]
        right = kvj[span + 1 + jnp.arange(j)] - u  # right[1..j]
        saved = 0.0
        N_new = jnp.zeros_like(N)
        for r in range(j):
            temp = N[r] / (right[r] + left[j - 1 - r])
            N_new = N_new.at[r].set(saved + right[r] * temp)
            saved = left[j - 1 - r] * temp
        N = N_new.at[j].set(saved)
    return N


def _basis_planes(kv: np.ndarray, p: int, u):
    """Batch-last Cox-de Boor: u is a (n,) plane of parameters.

    Returns (span (n,) int, N list of p+1 (n,) planes).  Every
    intermediate is a (n,) plane (the batch stays in the minor/tiled
    dim), so this vectorizes on TPU without the (n, p+1) lane padding a
    vmapped `_basis_static` would produce.  Differentiable in u (span
    is piecewise constant; jvp flows through left/right only).
    """
    kvj = jnp.asarray(kv, dtype=u.dtype)  # match the query dtype: a
    # float64 knot table would silently promote every plane (and break
    # f32 while_loop carries under jax_enable_x64)
    n_fn = len(kv) - p - 1
    span = jnp.clip(
        jnp.searchsorted(kvj, u, side="right") - 1, p, n_fn - 1
    )
    N = [jnp.ones_like(u)]
    for j in range(1, p + 1):
        # left[r] = u - kv[span - r], right[r] = kv[span + 1 + r] - u
        left = [u - kvj[span - r] for r in range(j)]
        right = [kvj[span + 1 + r] - u for r in range(j)]
        saved = jnp.zeros_like(u)
        N_new = []
        for r in range(j):
            temp = N[r] / (right[r] + left[j - 1 - r])
            N_new.append(saved + right[r] * temp)
            saved = left[j - 1 - r] * temp
        N_new.append(saved)
        N = N_new
    return span, N


class _SplineBase:
    """Tensor-product spline; cps (n, dim) lexicographic numpy storage."""

    def __init__(self, degrees, knot_vectors, control_points, weights=None):
        self.degrees = [int(d) for d in degrees]
        self.knot_vectors = [
            np.asarray(k, dtype=float) for k in knot_vectors
        ]
        self.cps = np.asarray(control_points, dtype=float)
        self.dim = self.cps.shape[1]
        self.para_dim = len(self.degrees)
        self.weights = (
            None if weights is None else np.asarray(weights, dtype=float).ravel()
        )
        self._n_ctrl = [
            len(kv) - p - 1
            for kv, p in zip(self.knot_vectors, self.degrees)
        ]
        assert int(np.prod(self._n_ctrl)) == len(self.cps)

    # ---- structure helpers ----
    @property
    def multi_index(self):
        return _MultiIndex(self._n_ctrl)

    @property
    def extract(self):
        """splinepy-style extraction namespace: `.boundaries(ids)` and
        `.spline(axis, interval)` (the surface the reference's
        examples/toy_problem.py:117-130 drives)."""
        return _Extractor(self)

    def parametric_bounds(self):
        lo = [kv[p] for kv, p in zip(self.knot_vectors, self.degrees)]
        hi = [kv[-p - 1] for kv, p in zip(self.knot_vectors, self.degrees)]
        return np.array(lo), np.array(hi)

    # ---- evaluation (pure function of (u, cps); degrees/kv static) ----
    def make_eval(self):
        """Returns f(u (para_dim,), cps_hom (n, dim[+1])) -> point; uses
        homogeneous coords if weights are present."""
        degrees = self.degrees
        kvs = self.knot_vectors
        n_ctrl = self._n_ctrl
        pd = self.para_dim
        rational = self.weights is not None

        def evaluate(u, cps):
            spans = [
                _find_span_static(kvs[d], degrees[d], u[d])
                for d in range(pd)
            ]
            bases = [
                _basis_static(kvs[d], degrees[d], spans[d], u[d])
                for d in range(pd)
            ]
            # gather local control points and contract
            if pd == 1:
                idx = spans[0] - degrees[0] + jnp.arange(degrees[0] + 1)
                local = cps[idx]
                acc = jnp.einsum("i,id->d", bases[0], local)
            elif pd == 2:
                i0 = spans[0] - degrees[0] + jnp.arange(degrees[0] + 1)
                i1 = spans[1] - degrees[1] + jnp.arange(degrees[1] + 1)
                flat = i0[:, None] + n_ctrl[0] * i1[None, :]
                local = cps[flat]  # (p0+1, p1+1, dim)
                acc = jnp.einsum("i,j,ijd->d", bases[0], bases[1], local)
            else:
                raise NotImplementedError("para_dim > 2 scenes")
            if rational:
                return acc[:-1] / acc[-1]
            return acc

        return evaluate

    def make_eval_planes(self):
        """Batch-last ("SoA") evaluator for the closest-point hot path.

        Returns f(u (para_dim, n), cps_t (dim_h, n_cp)) -> (dim, n):
        evaluate the spline at n parameter tuples at once with every
        intermediate a (n,) plane — the TPU-friendly replacement for
        vmapping `make_eval` over queries, whose tiny (para_dim,)- and
        (p+1,)-sized intermediates get (8,128)-tile padded ~100x.
        cps_t is the TRANSPOSED (homogeneous if rational) control data
        (`eval_cps().T`).  Differentiable in u (rational quotient rule
        included), so d1/d2 come from jax.jvp with plane seeds.
        """
        degrees = self.degrees
        kvs = self.knot_vectors
        n_ctrl = self._n_ctrl
        pd = self.para_dim
        rational = self.weights is not None

        def evaluate(u, cps_t):
            spans, bases = [], []
            for d in range(pd):
                s_, N_ = _basis_planes(kvs[d], degrees[d], u[d])
                spans.append(s_)
                bases.append(N_)
            if pd == 1:
                p0 = degrees[0]
                acc = None
                for i in range(p0 + 1):
                    idx = spans[0] - p0 + i
                    term = bases[0][i][None, :] * cps_t[:, idx]
                    acc = term if acc is None else acc + term
            elif pd == 2:
                p0, p1 = degrees
                acc = None
                for j in range(p1 + 1):
                    row = n_ctrl[0] * (spans[1] - p1 + j)
                    for i in range(p0 + 1):
                        flat = spans[0] - p0 + i + row
                        w_ij = bases[0][i] * bases[1][j]
                        term = w_ij[None, :] * cps_t[:, flat]
                        acc = term if acc is None else acc + term
            else:
                raise NotImplementedError("para_dim > 2 scenes")
            if rational:
                return acc[:-1] / acc[-1:]
            return acc

        return evaluate

    def eval_cps(self):
        """Current (possibly user-mutated) control data as a device array,
        homogeneous if rational."""
        if self.weights is None:
            return jnp.asarray(self.cps)
        return jnp.asarray(
            np.concatenate(
                [self.cps * self.weights[:, None], self.weights[:, None]],
                axis=1,
            )
        )

    def sample(self, resolutions):
        """Uniform grid sample of the parametric domain (numpy)."""
        if np.isscalar(resolutions):
            resolutions = [resolutions] * self.para_dim
        lo, hi = self.parametric_bounds()
        axes = [
            np.linspace(lo[d], hi[d], resolutions[d])
            for d in range(self.para_dim)
        ]
        grid = np.meshgrid(*axes, indexing="ij")
        params = np.stack([g.reshape(-1, order="F") for g in grid], axis=-1)
        ev = self.make_eval()
        pts = jax.vmap(lambda u: ev(u, self.eval_cps()))(
            jnp.asarray(params)
        )
        return np.asarray(pts)

    def copy(self):
        return type(self)._reconstruct(self)

    @classmethod
    def _reconstruct(cls, other):
        obj = _SplineBase.__new__(cls)
        _SplineBase.__init__(
            obj,
            other.degrees,
            other.knot_vectors,
            other.cps.copy(),
            None if other.weights is None else other.weights.copy(),
        )
        return obj


class _Extractor:
    """Extraction helpers matching the splinepy surface the reference
    examples use (splinepy boundary numbering: id = 2*axis + end, end 0
    = parametric min, end 1 = max)."""

    def __init__(self, spline):
        self._s = spline

    def boundaries(self, ids=None):
        """Boundary splines of a 2D tensor-product spline as 1D splines
        (control-point slices of the lexicographic grid; exact — the
        boundary of a B-spline patch is the B-spline of the boundary
        control polygon).  `ids` selects which (default: all 2*para_dim
        in splinepy order)."""
        s = self._s
        if s.para_dim != 2:
            raise NotImplementedError("boundaries(): para_dim == 2 only")
        n0, n1 = s._n_ctrl
        grid = np.arange(n0 * n1).reshape(n1, n0)  # [i1, i0]
        out = []
        for b in range(4) if ids is None else ids:
            axis, end = divmod(int(b), 2)
            if axis == 0:  # fix i0: curve along axis 1
                flat = grid[:, 0 if end == 0 else n0 - 1]
                deg, kv = s.degrees[1], s.knot_vectors[1]
            else:  # fix i1: curve along axis 0
                flat = grid[0 if end == 0 else n1 - 1, :]
                deg, kv = s.degrees[0], s.knot_vectors[0]
            cps = s.cps[flat].copy()
            if s.weights is None:
                out.append(BSpline([deg], cps, [kv.copy()]))
            else:
                out.append(
                    NURBS([deg], cps, [kv.copy()], s.weights[flat].copy())
                )
        return out

    def spline(self, axis, interval):
        """Parametric restriction of the spline to `interval` along
        `axis`.  Returned as a sampling view over the ORIGINAL
        evaluator (identical sampled points to splinepy's knot-insertion
        extraction, which the reference uses only to `.sample(...)` the
        tool path, examples/toy_problem.py:130)."""
        s = self._s
        lo, hi = s.parametric_bounds()
        lo = np.array(lo, dtype=float)
        hi = np.array(hi, dtype=float)
        lo[axis], hi[axis] = float(interval[0]), float(interval[1])
        return _RestrictedView(s, lo, hi)


class _RestrictedView:
    """Sampling view of a spline on a restricted parametric box."""

    def __init__(self, spline, lo, hi):
        self._s = spline
        self._lo = lo
        self._hi = hi
        self.para_dim = spline.para_dim
        self.dim = spline.dim

    def sample(self, resolutions):
        if np.isscalar(resolutions):
            resolutions = [resolutions] * self.para_dim
        axes = [
            np.linspace(self._lo[d], self._hi[d], resolutions[d])
            for d in range(self.para_dim)
        ]
        grid = np.meshgrid(*axes, indexing="ij")
        params = np.stack(
            [g.reshape(-1, order="F") for g in grid], axis=-1
        )
        ev = self._s.make_eval()
        pts = jax.vmap(lambda u: ev(u, self._s.eval_cps()))(
            jnp.asarray(params)
        )
        return np.asarray(pts)


class _MultiIndex:
    """splinepy-style multi_index: grid indices -> flat lexicographic ids."""

    def __init__(self, n_ctrl):
        self.n_ctrl = n_ctrl
        grid = np.arange(int(np.prod(n_ctrl))).reshape(
            *n_ctrl[::-1]
        ).transpose(*range(len(n_ctrl) - 1, -1, -1))
        self._grid = grid

    def __getitem__(self, key):
        return self._grid[key].ravel()


class Bezier(_SplineBase):
    def __init__(self, degrees, control_points):
        kvs = [
            np.array([0.0] * (d + 1) + [1.0] * (d + 1)) for d in degrees
        ]
        super().__init__(degrees, kvs, control_points)


class BSpline(_SplineBase):
    def __init__(self, degrees, control_points, knot_vectors):
        super().__init__(degrees, knot_vectors, control_points)


class NURBS(_SplineBase):
    def __init__(self, degrees, control_points, knot_vectors, weights):
        super().__init__(degrees, knot_vectors, control_points, weights)
