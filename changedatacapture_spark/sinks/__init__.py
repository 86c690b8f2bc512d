from . import lake, lineage  # noqa: F401
