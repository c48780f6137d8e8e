from . import mesh, sharded, train  # noqa: F401
