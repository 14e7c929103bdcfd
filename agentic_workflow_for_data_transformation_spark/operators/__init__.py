from . import corpus, dedup, joins, sampling, similarity, text, multimodal, windows

__all__ = [
    "corpus", "dedup", "joins", "sampling", "similarity", "text",
    "multimodal", "windows",
]
