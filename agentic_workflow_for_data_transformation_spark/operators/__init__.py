from . import corpus, dedup, graph, joins, quality, sampling, similarity, text, multimodal, windows

__all__ = [
    "corpus", "dedup", "graph", "joins", "quality", "sampling", "similarity", "text",
    "multimodal", "windows",
]
