"""Device meshes for sharded search/clustering.

The reference has zero parallelism machinery (SURVEY §2.7: the `-t` flag is
parsed but never used, pcluster.cpp:114,127-128); scaling there means "run
longer or shard input files by hand".  Here scale is a first-class axis
pair:

  * ``db``   — the database axis: the (N, L) k-mer matrix and the per-shard
               LSH tables are partitioned along N.  Each device owns an
               independent sub-index; probes are shard-local and the merge
               is one all-gather of fixed-size verified-hit blocks over ICI.
  * ``data`` — the query axis: center batches are data-parallel.

There is no parameter sharding to speak of (the "model" is a 20x8 constant
table), so tp/pp do not apply; the db axis is the model-parallel analog —
memory capacity scales with the mesh, queries broadcast across it.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P  # noqa: F401

DATA_AXIS = "data"
DB_AXIS = "db"


def make_mesh(n_devices: int | None = None, data: int | None = None,
              devices=None) -> Mesh:
    """Build a (data, db) mesh over the first ``n_devices`` devices.

    ``data`` defaults to the largest power of two <= sqrt(n) so both axes
    get parallelism; pass data=1 for a pure database-sharded mesh.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if data is None:
        # largest power of two p with p*p <= n and n % p == 0
        data = 1
        while (data * 2) ** 2 <= n_devices and n_devices % (data * 2) == 0:
            data *= 2
    if n_devices % data:
        raise ValueError(f"data axis {data} does not divide {n_devices}")
    arr = np.asarray(devices).reshape(data, n_devices // data)
    return Mesh(arr, (DATA_AXIS, DB_AXIS))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0,
                    fill=0) -> tuple[np.ndarray, int]:
    """Pad ``x`` along ``axis`` to a multiple; returns (padded, n_pad)."""
    n = x.shape[axis]
    pad = (-n) % multiple
    if pad == 0:
        return x, 0
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return np.pad(x, widths, constant_values=fill), pad
