"""Device mesh construction for SplatFields-TPU.

The reference is strictly single-GPU (SURVEY 2.20); this layer is new,
designed per SURVEY 5.8/7.8: a 2-D mesh with axes

- ``data``  : view (camera) parallelism — each data shard trains on its own
  subset of the same-fid view batch; gradients all-reduced over ICI.
- ``model`` : splat/tile parallelism — splats are sharded for the field-MLP
  forward (attributes all-gathered per device afterwards: the
  gather-per-tile pattern), and the rasterizer's tile grid is sharded for
  the blend (each chip composites its slice of tiles).

Multi-host: call :func:`initialize_distributed` first (jax.distributed);
the mesh is laid out so the ``model`` axis rides ICI within a host and
``data`` spans hosts/DCN.
"""
from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def initialize_distributed(coordinator_address=None, num_processes=None,
                           process_id=None):
    """jax.distributed bring-up for multi-host pods (no-op if single)."""
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)


def make_mesh(n_devices: int | None = None, data: int | None = None,
              devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the first n devices.

    ``data`` defaults to 1 (pure model/tile parallelism) — views are usually
    few (sparse reconstruction), splat and tile work dominate.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if data is None:
        data = 1
    assert n_devices % data == 0
    arr = np.array(devices).reshape(data, n_devices // data)
    return Mesh(arr, ("data", "model"))
