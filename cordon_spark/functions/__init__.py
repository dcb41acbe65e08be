"""Column-level function library: embeddings, text analysis, hashing."""
