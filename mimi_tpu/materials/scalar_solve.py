"""Safeguarded Newton-bisection scalar root solver (jittable, vmappable).

Math parity with the reference's `ScalarSolve`
(/root/reference/src/mimi/solvers/newton.hpp:53-169): same bracket
orientation, Newton/bisection switching rule and convergence criteria,
expressed as a lax.while_loop so it vectorizes over quadrature points.

Differentiation: the radial-return increment is needed inside jacfwd-based
element tangents, but while_loop is not forward-differentiable, so the
solver carries a custom JVP via the implicit function theorem:
   r(x*, theta) = 0  =>  dx* = -(dr/dtheta . dtheta) / (dr/dx).
(The reference instead sees this derivative through its forward-difference
element tangent; both converge to the same Newton fixed point.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def make_scalar_solver(residual_fn, xtol, rtol_factor, max_iter=100,
                       loop="while"):
    """residual_fn(x, *theta) -> residual value (differentiable).

    rtol is per-call: rtol = rtol_factor placeholder — callers pass rtol as
    first element of theta?  Simpler: rtol passed explicitly at call time.
    Returns solve(x0, lo, hi, rtol, theta) with implicit-diff JVP in theta.

    Shape-polymorphic: x0/lo/hi/theta may be arbitrary broadcastable
    batches (the SoA hot path calls it on whole (n_el, n_q) planes at
    once instead of vmapping per quad point); the while_loop then runs
    until every lane converges, freezing lanes that already have.

    loop="fori" runs a fixed max_iter-trip lax.fori_loop with the same
    per-lane freezing instead of the early-exit while_loop — Mosaic
    (Pallas TPU) cannot legalize while_loop, so the in-kernel radial
    return uses this variant (safeguarded bisection halves the bracket
    2^-max_iter, so ~40 trips reach beyond f32 resolution).
    """

    def val_grad(x, *theta):
        # value_and_grad requires scalar outputs; the elementwise jvp
        # with a ones tangent is the batch-polymorphic equivalent for
        # scalar->scalar maps applied lane-wise.
        x = jnp.asarray(x)
        return jax.jvp(
            lambda xx: residual_fn(xx, *theta), (x,), (jnp.ones_like(x),)
        )

    def _solve_raw(x0, lo, hi, rtol, theta):
        f_lo, _ = val_grad(lo, *theta)
        f_hi, _ = val_grad(hi, *theta)

        # orient search so that f(xl) < 0
        swap = f_lo > 0.0
        xl = jnp.where(swap, hi, lo)
        xh = jnp.where(swap, lo, hi)

        x_init = jnp.where((x0 < lo) | (x0 > hi), 0.5 * (lo + hi), x0)
        delta0 = jnp.abs(hi - lo)
        f0, df0 = val_grad(x_init, *theta)

        def cond(state):
            x, dx, dxo, f, df, xl_, xh_, it, conv = state
            return jnp.any(~conv) & (it < max_iter)

        def body(state):
            x, dx, dxo, f, df, xl_, xh_, it, conv = state
            use_bisect = (
                (((x - xh_) * df - f) > 0.0)
                | (((x - xl_) * df - f) < 0.0)
                | (jnp.abs(2.0 * f) > jnp.abs(dxo * df))
            )
            dxo_new = dx
            dx_bis = 0.5 * (xh_ - xl_)
            x_bis = xl_ + dx_bis
            dx_newt = f / df
            x_newt = x - dx_newt
            dx_new = jnp.where(use_bisect, dx_bis, dx_newt)
            x_new = jnp.where(use_bisect, x_bis, x_newt)
            # freeze already-converged lanes (batched solve: the loop
            # runs until the slowest lane converges)
            x_new = jnp.where(conv, x, x_new)
            dx_new = jnp.where(conv, dx, dx_new)
            f_new, df_new = val_grad(x_new, *theta)
            conv_new = conv | (
                (jnp.abs(dx_new) < xtol) | (jnp.abs(f_new) < rtol)
            )
            xl_new = jnp.where((f_new < 0.0) & (~conv), x_new, xl_)
            xh_new = jnp.where((f_new < 0.0) | conv, xh_, x_new)
            return (
                x_new,
                dx_new,
                dxo_new,
                f_new,
                df_new,
                xl_new,
                xh_new,
                it + 1,
                conv_new,
            )

        conv0 = jnp.zeros(
            jnp.broadcast_shapes(
                jnp.shape(x_init), jnp.shape(f0), jnp.shape(xl)
            ),
            bool,
        )
        state = (
            jnp.broadcast_to(x_init, conv0.shape),
            jnp.broadcast_to(delta0, conv0.shape),
            jnp.broadcast_to(delta0, conv0.shape),
            jnp.broadcast_to(f0, conv0.shape),
            jnp.broadcast_to(df0, conv0.shape),
            jnp.broadcast_to(xl, conv0.shape),
            jnp.broadcast_to(xh, conv0.shape),
            jnp.array(0),
            conv0,
        )
        if loop == "fori":
            # Mosaic cannot legalize i1 (bool) vector loop carries:
            # round-trip the convergence mask through the value dtype
            def body_f(_, s):
                *rest, conv_f = s
                out = body((*rest, conv_f > 0.5))
                return (*out[:-1], out[-1].astype(s[0].dtype))

            state_f = (*state[:-1], conv0.astype(state[0].dtype))
            x_sol = jax.lax.fori_loop(0, max_iter, body_f, state_f)[0]
        else:
            x_sol = jax.lax.while_loop(cond, body, state)[0]

        # corner cases: a bracket endpoint is already the root
        x_sol = jnp.where(jnp.abs(f_hi) < xtol, hi, x_sol)
        x_sol = jnp.where(jnp.abs(f_lo) < xtol, lo, x_sol)
        return x_sol

    @jax.custom_jvp
    def solve(x0, lo, hi, rtol, theta):
        return _solve_raw(x0, lo, hi, rtol, theta)

    @solve.defjvp
    def solve_jvp(primals, tangents):
        x0, lo, hi, rtol, theta = primals
        _, dlo, dhi, _, dtheta = tangents
        x_star = solve(x0, lo, hi, rtol, theta)
        # implicit diff: dr/dx * dx + dr/dtheta . dtheta = 0
        _, df_dx = jax.jvp(
            lambda xx: residual_fn(xx, *theta),
            (x_star,),
            (jnp.ones_like(x_star),),
        )
        # JVP of residual in theta directions at fixed x
        r_theta = lambda th: residual_fn(x_star, *th)
        _, dr = jax.jvp(r_theta, (theta,), (dtheta,))
        dx_star = -dr / df_dx
        return x_star, dx_star

    return solve
