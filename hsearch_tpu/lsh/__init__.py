from . import pstable  # noqa: F401
