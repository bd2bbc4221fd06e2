from . import mesh, transform  # noqa: F401
