from . import rays, render, sampling  # noqa: F401
