"""Ingestion sources beyond parquet: WARC (Common-Crawl archive format)."""
