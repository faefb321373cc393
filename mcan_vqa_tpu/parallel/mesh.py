"""Device mesh construction for dp x tp SPMD execution.

The reference's only parallelism is single-process nn.DataParallel
(reference: core/exec.py:62-63); there is no distributed backend at all
(no torch.distributed anywhere). The TPU-native replacement is a
jax.sharding.Mesh over all chips:

  * axis "data"  — batch-sharded data parallelism; gradient all-reduce is
    inserted by XLA's SPMD partitioner (rides ICI).
  * axis "model" — tensor parallelism over attention heads / FFN hidden dim
    (Megatron pattern: column-parallel up-projections, row-parallel
    down-projections), useful for MCAN-large (hidden 1024).

One code path from 1 chip to a pod slice: shape {"data": 1, "model": 1}
degenerates to single-device execution with zero collectives.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(shape: Optional[Dict[str, int]] = None,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a ("data", "model") mesh.

    shape=None uses all devices on the data axis. The product of axis sizes
    must equal the device count.
    """
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = {DATA_AXIS: n, MODEL_AXIS: 1}
    unknown = set(shape) - {DATA_AXIS, MODEL_AXIS}
    assert not unknown, (
        f"unknown mesh axes {sorted(unknown)}: valid axes are "
        f'"{DATA_AXIS}" and "{MODEL_AXIS}" (a typo here would silently '
        f"build a 1x1 single-device mesh)")
    dp = int(shape.get(DATA_AXIS, 1))
    tp = int(shape.get(MODEL_AXIS, 1))
    assert tp >= 1, (
        f"model axis must be a positive size, got {tp} (-1 inference is "
        f"supported for the data axis only)")
    if dp == -1:
        assert n % tp == 0, (n, tp)
        dp = n // tp
    assert dp >= 1, f"data axis must be positive or -1, got {dp}"
    assert dp * tp <= n, f"mesh {dp}x{tp} needs more than {n} devices"
    # A smaller mesh than the host offers is allowed (single-chip runs,
    # tests); the first dp*tp devices are used.
    # tp on the minor (fastest, contiguous-ICI) axis, dp on the major axis.
    grid = np.asarray(devices[: dp * tp]).reshape(dp, tp)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-dim batch sharding over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
