from . import bm25  # noqa: F401
