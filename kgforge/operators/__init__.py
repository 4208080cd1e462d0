"""Corpus-scale operators (DataFrame in, DataFrame out)."""
