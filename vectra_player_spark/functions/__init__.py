"""Column-level function library (all JVM-side Spark built-ins).

Submodules:
- exact: decimal-exact aggregation helpers for oracle-matching float sums
- text: tokenization, quality scoring, language-ID heuristic, fingerprints
- hashing: md5-derived minhash / simhash primitives (engine-portable)
- vectors: dot / cosine over array<float> columns via higher-order functions
"""
