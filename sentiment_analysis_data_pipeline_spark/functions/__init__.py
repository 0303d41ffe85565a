from . import hashing, sentiment, text, vectors
from .dialect import SPARK, DUCKDB

__all__ = ["hashing", "sentiment", "text", "vectors", "SPARK", "DUCKDB"]
