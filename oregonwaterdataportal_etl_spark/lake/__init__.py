from .table import LakeTable, MergeResult

__all__ = ["LakeTable", "MergeResult"]
