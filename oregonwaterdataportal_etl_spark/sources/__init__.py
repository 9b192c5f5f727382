from . import readers

__all__ = ["readers"]
