from . import profiling, tb, term  # noqa: F401
