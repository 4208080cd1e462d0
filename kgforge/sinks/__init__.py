"""Partitioned sinks + run manifests."""
