from . import dedup, multimodal, pandas_ops, similarity, text

__all__ = ["dedup", "multimodal", "pandas_ops", "similarity", "text"]
