"""Multi-chip execution: device mesh, sharded profiling, default-mesh registry.

The process default mesh, once set (CLI --mesh auto, or set_default_mesh in
code), makes every device compute path — aligner query batches and the
full-parity coverage engine — shard its read batch across the mesh's "reads"
axis, with XLA inserting the ICI collectives from the sharding annotations.
"""
from .mesh import make_mesh

_DEFAULT_MESH = None


def set_default_mesh(mesh) -> None:
    """Install (or clear, with None) the process-wide read-sharding mesh."""
    global _DEFAULT_MESH
    _DEFAULT_MESH = mesh


def default_mesh():
    return _DEFAULT_MESH


def auto_mesh(spec: str = "auto"):
    """Resolve a --mesh flag value: "auto" builds a mesh over all local
    devices when more than one is visible, "off" disables sharding, an
    integer uses that many devices.  Installs and returns the default mesh
    (None when single-device)."""
    import jax

    if spec == "off":
        set_default_mesh(None)
        return None
    n = len(jax.devices()) if spec == "auto" else int(spec)
    if n <= 1:
        set_default_mesh(None)
        return None
    mesh = make_mesh(n)
    set_default_mesh(mesh)
    return mesh


__all__ = [
    "make_mesh",
    "set_default_mesh",
    "default_mesh",
    "auto_mesh",
]
