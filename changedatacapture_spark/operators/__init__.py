from . import apply, envelope, evolution, lww, skew  # noqa: F401
