from . import asof, dedup, relational, similarity

__all__ = ["asof", "dedup", "relational", "similarity"]
