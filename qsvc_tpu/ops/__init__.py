from . import lifting, dwt2d, border, entropy  # noqa: F401
