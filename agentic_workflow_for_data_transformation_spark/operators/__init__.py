from . import corpus, dedup, joins, sampling, similarity, text, multimodal

__all__ = ["corpus", "dedup", "joins", "sampling", "similarity", "text", "multimodal"]
