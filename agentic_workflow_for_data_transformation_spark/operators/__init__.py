from . import dedup, joins, sampling, similarity, text, multimodal

__all__ = ["dedup", "joins", "sampling", "similarity", "text", "multimodal"]
