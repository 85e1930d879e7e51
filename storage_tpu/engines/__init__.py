from . import intrinsic  # noqa: F401
