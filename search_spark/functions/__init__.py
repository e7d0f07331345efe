from . import bm25, sim, text  # noqa: F401
