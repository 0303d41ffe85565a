from . import aggregates, dedup, multimodal, search, similarity, validate, window_ops

__all__ = [
    "aggregates",
    "dedup",
    "multimodal",
    "search",
    "similarity",
    "validate",
    "window_ops",
]
