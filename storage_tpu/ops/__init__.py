from . import interp, regression  # noqa: F401
