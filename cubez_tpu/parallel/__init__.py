"""Distributed layer: 3D device mesh, halo exchange, sharded solver steps."""

from .mesh import CubeMesh, make_mesh

__all__ = ["CubeMesh", "make_mesh", "solve_dist"]


def __getattr__(name):
    # solve_dist pulls in the full solver stack; import it lazily so that
    # `from cubez_tpu.parallel import make_mesh` stays light
    if name == "solve_dist":
        from .api import solve_dist

        return solve_dist
    raise AttributeError(name)
