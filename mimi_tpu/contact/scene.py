"""Rigid-body contact scenes: vectorized closest-point projection onto
splines.

Replaces the reference's splinepy-backed `NearestDistanceToSplines`
(/root/reference/src/mimi/coefficients/nearest_distance.hpp:215-288): the
kd-tree seed search becomes an argmin over a sampled parameter grid, and
the per-query Newton closest-point iteration is a fixed-trip damped Newton
in the parametric domain, vmapped over all quadrature points at once.

Normal convention (nearest_distance.hpp:139-184): 2D n = (d1y, -d1x)/|d1|;
3D n = d1 x d2 normalized.  NormalGap = -n . (physical - query).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


class NearestDistance:
    """Base scene: penalty coefficient + search tolerance
    (nearest_distance.hpp:15-213)."""

    def __init__(self):
        self.coefficient = 1.0e4
        self.tolerance = 1.0e-24


class NearestDistanceToSplines(NearestDistance):
    def __init__(self):
        super().__init__()
        self.splines = []
        self._samples = None  # (S, para_dim) parameter seeds
        self._query_fns = None

    def clear(self):
        self.splines.clear()

    def add_spline(self, spline):
        self.splines.append(spline)

    def plant_kd_tree(self, resolution: int, nthreads: int = 1):
        assert len(self.splines) >= 1, "scene needs at least one spline"
        self._samples = []
        for s in self.splines:
            if np.isscalar(resolution):
                res = [int(resolution)] * s.para_dim
            else:
                res = list(resolution)
            lo, hi = s.parametric_bounds()
            axes = [
                np.linspace(lo[d], hi[d], res[d])
                for d in range(s.para_dim)
            ]
            grid = np.meshgrid(*axes, indexing="ij")
            self._samples.append(
                np.stack([g.reshape(-1, order="F") for g in grid], axis=-1)
            )

    # ---------- jit data / functions ----------
    def scene_data(self):
        """Dynamic pytree consumed by the jitted query: per spline, the
        current control data + seed parameters (+ their images under the
        current cps)."""
        fns = self._get_fns()
        out = []
        for i, s in enumerate(self.splines):
            cps = s.eval_cps()
            samples = jnp.asarray(self._samples[i])
            ev = fns["evals"][i]
            sample_pts = jax.vmap(lambda u: ev(u, cps))(samples)
            out.append(
                {"cps": cps, "samples": samples, "sample_pts": sample_pts}
            )
        return out

    def _get_fns(self):
        if self._query_fns is None:
            evals = [s.make_eval() for s in self.splines]
            queries = [
                self._make_query_one(s, ev)
                for s, ev in zip(self.splines, evals)
            ]
            self._query_fns = {"evals": evals, "queries": queries,
                               "eval": evals[0]}
        return self._query_fns

    def _make_query_one(self, s, ev):
            lo, hi = s.parametric_bounds()
            lo = jnp.asarray(lo)
            hi = jnp.asarray(hi)

            d1_fn = jax.jacfwd(ev, argnums=0)  # (dim, para_dim)

            def objective(u, q, cps):
                d = ev(u, cps) - q
                return 0.5 * jnp.dot(d, d)

            grad_fn = jax.grad(objective, argnums=0)
            hess_fn = jax.hessian(objective, argnums=0)

            def query_one(q, cps, samples, sample_pts, n_iter=30):
                # seed: argmin over samples
                d2 = jnp.sum((sample_pts - q[None, :]) ** 2, axis=1)
                u = samples[jnp.argmin(d2)]

                def body(_, u):
                    g = grad_fn(u, q, cps)
                    H = hess_fn(u, q, cps)
                    # regularized solve (para_dim is 1 or 2)
                    H = H + 1e-14 * jnp.eye(H.shape[0], dtype=H.dtype)
                    du = jnp.linalg.solve(H, g)
                    f0 = objective(u, q, cps)
                    # damped update: try alpha in {1, 1/2, ..., 1/128},
                    # keep the first that decreases f (fixed unrolled chain)
                    u_best = u
                    found = jnp.array(False)
                    for k in range(8):
                        alpha = 0.5**k
                        u_try = jnp.clip(u - alpha * du, lo, hi)
                        f_try = objective(u_try, q, cps)
                        take = (~found) & (f_try <= f0)
                        u_best = jnp.where(take, u_try, u_best)
                        found = found | take
                    return u_best

                u = jax.lax.fori_loop(0, n_iter, body, u)
                phys = ev(u, cps)
                d1 = d1_fn(u, cps)  # (dim, para_dim)
                pmq = phys - q
                dist = jnp.linalg.norm(pmq)
                if d1.shape[0] == 2:  # 2D: tangent (dx,dy) -> n=(dy,-dx)
                    t = d1[:, 0]
                    n = jnp.array([t[1], -t[0]])
                else:
                    n = jnp.cross(d1[:, 0], d1[:, 1])
                n = n / jnp.linalg.norm(n)
                normal_gap = -jnp.dot(n, pmq)
                return {
                    "parametric": u,
                    "physical": phys,
                    "distance": dist,
                    "normal": n,
                    "normal_gap": normal_gap,
                }

            return query_one

    def make_batched_query(self):
        """Vectorized closest-point query over all scene splines: each
        query point takes the minimum-distance result (generalizes the
        reference, which asserts a single spline per scene,
        nearest_distance.hpp:263)."""
        fns = self._get_fns()
        queries = fns["queries"]

        def batched(qpts, data):
            results = [
                jax.vmap(
                    lambda q: qo(
                        q, d["cps"], d["samples"], d["sample_pts"]
                    )
                )(qpts)
                for qo, d in zip(queries, data)
            ]
            if len(results) == 1:
                return results[0]
            stacked = jax.tree.map(
                lambda *xs: jnp.stack(xs, axis=0), *results
            )
            best = jnp.argmin(stacked["distance"], axis=0)  # (n_q,)
            take = lambda arr: jnp.take_along_axis(
                arr,
                best.reshape(
                    (1, -1) + (1,) * (arr.ndim - 2)
                ),
                axis=0,
            )[0]
            return jax.tree.map(take, stacked)

        return batched

    def size(self):
        return len(self.splines)
