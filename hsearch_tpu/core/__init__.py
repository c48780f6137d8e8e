from . import alphabet, blosum, embedding  # noqa: F401
