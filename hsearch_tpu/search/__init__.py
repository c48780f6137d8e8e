from . import exact, motif  # noqa: F401
