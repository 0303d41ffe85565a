from .pipeline import flagship_terms_agg, sentiment_enrich, documents_as_articles

__all__ = ["flagship_terms_agg", "sentiment_enrich", "documents_as_articles"]
