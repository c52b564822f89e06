"""RuntimeCommunication: string-keyed config store + history + npz export.

Parity with /root/reference/src/mimi/utils/runtime_communication.hpp:48-198.
Export uses numpy's npz (append semantics emulated by rewriting the archive
with accumulated arrays, matching cnpy append-mode observable behavior).
"""

from __future__ import annotations

import os
import zipfile

import numpy as np


class RuntimeCommunication:
    def __init__(self):
        self.fname = ""
        self._real: dict[str, float] = {}
        self._int: dict[str, int] = {}
        self._save_every: dict[str, int] = {}
        self._real_history: dict[str, list] = {}
        self._latest_vector: dict[str, np.ndarray] = {}
        self._i_timestep = 0
        self._t = 0.0

    # -- timestep counter --
    def initialize_time_step(self):
        self._i_timestep = 0
        self._t = 0.0

    def next_time_step(self, dt: float):
        self._i_timestep += 1
        self._t += dt

    @property
    def i_timestep(self):
        return self._i_timestep

    # -- config store --
    def set_fname(self, fname: str):
        self.fname = fname

    def get_real(self, key: str, default: float) -> float:
        return self._real.get(key, default)

    def set_real(self, key: str, value: float):
        self._real[key] = value

    def get_int(self, key: str, default: int) -> int:
        return self._int.get(key, default)

    def set_int(self, key: str, value: int):
        self._int[key] = value

    # -- save gating --
    def append_should_save(self, name: str, every: int):
        self._save_every[name] = every

    def should_save(self, name: str) -> bool:
        every = self._save_every.get(name)
        if every is None:
            return False
        return self._i_timestep % every == 0

    # -- histories --
    def setup_real_history(self, name: str, n_reserve: int = 0):
        self._real_history.setdefault(name, [])

    def record_real_history(self, name: str, value: float):
        self._real_history.setdefault(name, []).append(float(value))

    def get_real_history(self, name: str):
        return np.array(self._real_history[name])

    def get_real_history_at(self, name: str, at: int) -> float:
        return self._real_history[name][at]

    def save_real_history(self, name: str):
        self.save_vector(
            name + "_history", np.array(self._real_history[name])
        )

    # -- npz export (cnpy append-mode equivalent) --
    def _npz_append(self, key: str, arr: np.ndarray):
        if not self.fname:
            print(
                "Save requested, but fname not set in RuntimeCommunication"
            )
            return
        arr = np.asarray(arr)
        mode = "a" if os.path.exists(self.fname) else "w"
        with zipfile.ZipFile(self.fname, mode, zipfile.ZIP_STORED) as zf:
            with zf.open(key + ".npy", "w") as f:
                np.lib.format.write_array(f, arr)

    def save_vector(self, name: str, arr) -> None:
        self._npz_append(name, np.asarray(arr))

    def save_dynamic_vector(self, name: str, arr) -> None:
        arr = np.asarray(arr)
        self._npz_append(name + str(self._i_timestep), arr)
        self._latest_vector[name] = arr.copy()

    def latest_vector(self, name: str) -> np.ndarray:
        return self._latest_vector[name]
