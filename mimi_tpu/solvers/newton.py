"""Newton with 3-point-quadratic line search and best-iterate window.

Math parity with the reference's LineSearchNewton
(/root/reference/src/mimi/solvers/newton.cpp:10-218, itself adapted from
LLNL ExaConstit): per iteration solve J c = r, evaluate the residual norm at
the full and half step, fit eps = (3 q1 - 4 q2 + q3)/(4 (q1 - 2 q2 + q3)),
use eps if the fit is a valid interior minimum, else 1.0 if q3 < q1, else
0.05; keep the best iterate over a 5-iteration improvement window and return
it on non-convergence.

The driver loop runs in Python; the callbacks it invokes (fused
residual+grad assembly, residual-only assembly, linear solve) are
jit-compiled device functions, so per-iteration Python overhead is a few
dispatches.
"""

from __future__ import annotations

import numpy as np


class LineSearchNewton:
    def __init__(self):
        self.rel_tol = 1e-8
        self.abs_tol = 1e-12
        self.max_iter = 10
        self.iterative_mode = False
        self.print_level = 0
        # results
        self.converged = False
        self.final_iter = 0
        self.final_norm = np.inf
        self.initial_norm = np.inf

    def configure(self, rel_tol, abs_tol, max_iter, iterative_mode):
        self.rel_tol = float(rel_tol)
        self.abs_tol = float(abs_tol)
        self.max_iter = int(max_iter)
        self.iterative_mode = bool(iterative_mode)

    def solve(
        self,
        x,
        residual_and_grad,
        residual_only,
        solve_linear,
        pair_norms=None,
        update_assemble=None,
    ):
        """x: initial guess (device array). Returns final x.

        `pair_norms(x, c) -> (q3, q2)` and
        `update_assemble(x, c, scale, final) -> (x_new, r, J, norm)` are
        optional fused device calls: without them each line-search /
        update costs 2-3 separate dispatches with a host sync each; with
        them one dispatch + one scalar sync.  Math is identical."""
        import jax.numpy as jnp

        from ..utils import log

        if not self.iterative_mode:
            x = jnp.zeros_like(x)

        improved = [True] * 5
        i_improved = 0
        best_it = 0
        best_residual = np.inf
        best_x = x

        r, J = residual_and_grad(x)
        norm0 = norm = float(jnp.linalg.norm(r))
        self.initial_norm = norm0
        norm_goal = max(self.rel_tol * norm0, self.abs_tol)

        it = 0
        while True:
            if self.print_level > 0:
                log.print_info(
                    f"Newton iteration {it:2d} : ||r|| = {norm}"
                )
            if not np.isfinite(norm):
                self.converged = False
                break
            if norm <= norm_goal:
                self.converged = True
                break
            if it >= self.max_iter:
                self.converged = False
                if it != 0:
                    x = best_x
                break
            if not any(improved):
                self.converged = False
                x = best_x
                break

            c = solve_linear(J, r)

            q1 = norm
            if pair_norms is not None:
                q3, q2 = pair_norms(x, c)
            else:
                q3 = float(jnp.linalg.norm(residual_only(x - c)))
                q2 = float(jnp.linalg.norm(residual_only(x - 0.5 * c)))

            denom = q1 - 2.0 * q2 + q3
            eps = (
                (3.0 * q1 - 4.0 * q2 + q3) / (4.0 * denom)
                if denom != 0.0
                else -1.0
            )
            if denom > 0 and 0.0 < eps < 1.0:
                scale = eps
            elif q3 < q1:
                scale = 1.0
            else:
                scale = 0.05

            if abs(scale) < 1e-12:
                self.converged = False
                break

            it += 1
            final = it == self.max_iter
            if update_assemble is not None:
                x, r, J, norm = update_assemble(x, c, scale, final)
            else:
                x = x - scale * c
                if final:
                    r = residual_only(x)
                    J = None
                else:
                    r, J = residual_and_grad(x)
                norm = float(jnp.linalg.norm(r))

            # keep best (newton.cpp:17-47)
            if norm < best_residual:
                best_x = x
                improved[i_improved % 5] = True
                best_residual = norm
                best_it = it
            else:
                improved[i_improved % 5] = False
            i_improved += 1

        self.final_iter = it
        self.final_norm = norm
        return x

    def final_norms(self):
        rel = (
            self.final_norm / self.initial_norm
            if self.initial_norm > 0
            else 0.0
        )
        return rel, self.final_norm
