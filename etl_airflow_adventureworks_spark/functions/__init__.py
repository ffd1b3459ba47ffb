from . import money, scalar  # noqa: F401
