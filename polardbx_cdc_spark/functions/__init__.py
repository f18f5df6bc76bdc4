"""Large-scale training-data pipeline operators (dedup, similarity search,
text analysis, multimodal plumbing) — the north-star extensions beyond the
reference's own surface, built JVM-side wherever possible.
"""
