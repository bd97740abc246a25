"""Structured Streaming surfaces (SURVEY §2.9): micro-batch seed
ingestion, watermarked windowed crawl metrics."""
