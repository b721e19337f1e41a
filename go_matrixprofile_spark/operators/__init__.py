"""Spark DataFrame operators: series derivation, rollup tiers, gap-fill,
distributed matrix profile, dedup, similarity search, text analysis."""
