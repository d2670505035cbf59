from . import encoding, mlp  # noqa: F401
