from . import dedup, multimodal, pandas_ops, search, similarity, text

__all__ = ["dedup", "multimodal", "pandas_ops", "search", "similarity", "text"]
