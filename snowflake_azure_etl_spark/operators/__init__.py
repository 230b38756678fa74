from . import dedup, graph, multimodal, similarity, sketches, text

__all__ = ["dedup", "graph", "multimodal", "similarity", "sketches", "text"]
