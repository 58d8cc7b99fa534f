"""Device-mesh construction for 3D block decomposition.

Replaces the CBrick SubDomain/BrickComm layer (cz_Evaluate.cpp:103-159) with
a ``jax.sharding.Mesh`` over axes ('z', 'x', 'y') matching the (K, I, J)
array layout, and NamedShardings for the field arrays.
"""

from __future__ import annotations

import dataclasses

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .decomp import auto_division

AXES = ("z", "x", "y")
FIELD_SPEC = P("z", "x", "y")


@dataclasses.dataclass(frozen=True)
class CubeMesh:
    mesh: Mesh

    @property
    def div(self) -> tuple[int, int, int]:
        return tuple(self.mesh.devices.shape)

    @property
    def field_sharding(self) -> NamedSharding:
        return NamedSharding(self.mesh, FIELD_SPEC)

    def shard(self, arr):
        return jax.device_put(arr, self.field_sharding)


def make_mesh(gsize, devices=None, div=None) -> CubeMesh:
    """Build a ('z','x','y') mesh for a (nk, ni, nj) grid.

    ``div`` pins the division like the reference's gdv_x/y/z args
    (main.cpp:19-30); otherwise auto-search (findOptimalDivision).
    Every axis of the grid must divide evenly (pad upstream otherwise).
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if div is None:
        div = auto_division(n, gsize)
    dz, dx, dy = div
    if dz * dx * dy != n:
        raise ValueError(f"division {div} does not match {n} devices")
    for g, d, name in zip(gsize, div, AXES):
        if g % d:
            raise ValueError(f"grid axis {name}={g} not divisible by {d}")
    devs = np.asarray(devices).reshape(dz, dx, dy)
    return CubeMesh(mesh=Mesh(devs, AXES))
