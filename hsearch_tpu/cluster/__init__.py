from . import greedy, centroid, union_find  # noqa: F401
