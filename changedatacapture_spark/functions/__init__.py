from . import dedup, similarity, text, transform  # noqa: F401
