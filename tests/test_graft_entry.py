"""Guard the driver's gate entry points.

The driver compile-checks ``__graft_entry__.entry()`` single-chip and
runs ``dryrun_multichip`` on a virtual CPU mesh.  ``entry`` is the only
consumer of ``sharding.make_forward``, so without this test a sharding
refactor could break the gate silently.  (``dryrun_multichip`` itself
must own process startup — it sets XLA device-count flags before jax
import — so it is exercised by the driver, not here; this test covers
the shared build path and the forward step.)
"""

import os
import sys

import jax.numpy as jnp
import pytest

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def test_entry_forward_runs():
    import __graft_entry__ as ge

    fwd, args = ge.entry()
    out = fwd(*args)
    assert out.shape == args[0].shape
    assert bool(jnp.all(jnp.isfinite(out)))
    # zero acceleration at the undeformed state leaves the body-force
    # rhs as the residual: must be nonzero
    assert float(jnp.abs(out).max()) > 0.0
