"""Device mesh construction helpers."""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None, axis: str = "d") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        assert len(devs) >= n_devices, \
            f"need {n_devices} devices, have {len(devs)}"
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def default_mesh() -> Mesh:
    return make_mesh(len(jax.devices()))
