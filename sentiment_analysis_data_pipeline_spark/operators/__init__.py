from . import aggregates, dedup, multimodal, search, similarity, skew, validate, window_ops

__all__ = [
    "aggregates",
    "dedup",
    "multimodal",
    "search",
    "similarity",
    "skew",
    "validate",
    "window_ops",
]
