"""Large-scale training-data pipeline operators (dedup, similarity,
text analysis) as native DataFrame transformations — JVM-side
expressions only, no Python UDFs in any hot path."""
