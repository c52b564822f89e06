"""Checkpoint / resume of the full dynamic state.

The reference only has write-only npz snapshots of x and v
(RuntimeCommunication; SURVEY.md §5 'there is no load/resume path').  Here
the complete state is a pytree — displacement, velocity, acceleration,
generalized-alpha internals and per-quad-point material state — so true
resume is a flat npz round trip.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def save_checkpoint(solid, fname: str) -> None:
    sysm = solid._require_system()
    sysm._sync_views_in()
    payload = {
        "u": np.asarray(sysm.u),
        "v": np.asarray(sysm.v),
        "a": np.asarray(sysm.a),
        "t": np.asarray(solid.current_time),
        "dt": np.asarray(solid.time_step_size),
        "nstate": np.asarray(sysm.ode.nstate),
        "i_timestep": np.asarray(sysm.rc.i_timestep),
    }
    if sysm.ode.aa is not None:
        payload["ode_aa"] = np.asarray(sysm.ode.aa)
    if sysm.state is not None:
        for k, v in sysm.state.items():
            payload[f"state/{k}"] = np.asarray(v)
    np.savez(fname, **payload)


def load_checkpoint(solid, fname: str) -> None:
    sysm = solid._require_system()
    data = np.load(fname)
    sysm.u = jnp.asarray(data["u"])
    sysm.v = jnp.asarray(data["v"])
    sysm.a = jnp.asarray(data["a"])
    solid._t = float(data["t"])
    solid.time_step_size = float(data["dt"])
    sysm.ode.nstate = int(data["nstate"])
    if "ode_aa" in data.files:
        sysm.ode.aa = jnp.asarray(data["ode_aa"])
    if sysm.state is not None:
        sysm.state = {
            k: jnp.asarray(data[f"state/{k}"]) for k in sysm.state
        }
    sysm.rc._i_timestep = int(data["i_timestep"])
    sysm._sync_views_out()
