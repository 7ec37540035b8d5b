"""Mesh construction helpers.

The framework's standard mesh axes:

* ``"data"`` — utterance/frame-batch data parallelism (every EM/TV/JFA/PLDA
  stat accumulation shards over it and psums, SURVEY.md §2.6).
* ``"model"`` — optional component-axis sharding of the UBM / T-matrix /
  per-component accumulators when they exceed one chip's HBM.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh


def device_count() -> int:
    return len(jax.devices())


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: list | None = None,
) -> Mesh:
    """Build a ("data", "model") mesh over the available devices."""
    devs = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devs) // n_model
    assert n_data * n_model <= len(devs), (
        f"mesh {n_data}x{n_model} needs more than {len(devs)} devices")
    grid = np.asarray(devs[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))
