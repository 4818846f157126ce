"""Device mesh and sharding helpers.

The reference's "scale" is Slurm job farming (SURVEY.md §2.9); here scale is
a `jax.sharding.Mesh`: rollout/solve batches shard over a 'batch' axis whose
collectives ride ICI within a slice and DCN across slices. These helpers
centralize the common patterns used by the learning stack and the driver
entry points.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def batch_mesh(n_devices: int | None = None) -> Mesh:
    """1-D data-parallel mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), axis_names=("batch",))


def multihost_mesh(dcn: int | None = None, devices=None) -> Mesh:
    """2-D ('dcn', 'ici') mesh for multi-host runs: the leading axis spans
    hosts (collectives cross the data-center network), the trailing axis the
    chips within a host (collectives ride ICI). Shardings that partition the
    batch over ``("dcn", "ici")`` keep the all-reduce hierarchical — XLA
    reduces within a host first, then once across hosts.

    * Real multi-host (after ``jax.distributed.initialize``): ``dcn`` defaults
      to ``jax.process_count()`` and ``jax.devices()`` already spans all
      hosts.
    * Single-process validation: pass ``dcn`` explicitly to split the local
      device list into simulated hosts (the virtual-CPU smoke path,
      scripts/bench_multichip.py ``dcn=``).
    """
    devs = np.array(jax.devices() if devices is None else devices)
    if dcn is None:
        dcn = max(jax.process_count(), 1)
    if len(devs) % dcn:
        raise ValueError(f"{len(devs)} devices not divisible by dcn={dcn}")
    return Mesh(devs.reshape(dcn, -1), axis_names=("dcn", "ici"))


def shard_batch_2d(mesh: Mesh, tree):
    """Place a pytree with leading batch axes onto a ('dcn', 'ici') mesh,
    batch partitioned over both axes (hierarchical data parallelism)."""
    sh = NamedSharding(mesh, P(("dcn", "ici")))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def shard_batch(mesh: Mesh, tree):
    """Place a pytree with leading batch axes onto the mesh ('batch' sharded)."""
    sh = NamedSharding(mesh, P("batch"))
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def replicate(mesh: Mesh, tree):
    """Replicate a pytree (parameters, optimizer state) across the mesh."""
    sh = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda a: jax.device_put(a, sh), tree)


def pad_to_devices(arr: np.ndarray, n_devices: int):
    """Pad the leading axis to a multiple of the device count (returns the
    padded array and the original length)."""
    n = arr.shape[0]
    rem = (-n) % n_devices
    if rem:
        arr = np.concatenate([arr, np.repeat(arr[-1:], rem, axis=0)], axis=0)
    return arr, n


def scaling_efficiency(solves_per_sec: dict[int, float]) -> dict[int, float]:
    """Scaling efficiency vs the smallest device count (BASELINE.md target:
    >= 85% at 4 hosts)."""
    base_n = min(solves_per_sec)
    base = solves_per_sec[base_n] / base_n
    return {n: (v / n) / base for n, v in solves_per_sec.items()}
