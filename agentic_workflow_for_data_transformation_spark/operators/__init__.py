from . import corpus, dedup, graph, joins, sampling, similarity, text, multimodal, windows

__all__ = [
    "corpus", "dedup", "graph", "joins", "sampling", "similarity", "text",
    "multimodal", "windows",
]
