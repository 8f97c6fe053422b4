"""Dataset-level operators for large-scale training-data pipelines:
dedup (exact / MinHash-LSH / SimHash), text analysis (tokens, quality,
language id, fingerprints), ANN over embedding columns, event windows,
and multimodal (binary-column) plumbing."""
