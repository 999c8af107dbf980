"""Large-scale training-data pipeline operators built on the same engine
primitives: deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard,
embedding cosine), similarity search (brute-force + IVF), text analysis
(token stats, quality, language-ID, fingerprinting), and multimodal column
plumbing. All vectorized (Arrow/numpy) — no per-row Python in hot paths."""
