from . import dedup, joins, similarity, text, multimodal

__all__ = ["dedup", "joins", "similarity", "text", "multimodal"]
