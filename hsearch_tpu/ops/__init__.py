from . import distance, segment  # noqa: F401
