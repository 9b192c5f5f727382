from . import asof, dedup, relational, similarity, transcripts

__all__ = ["asof", "dedup", "relational", "similarity", "transcripts"]
