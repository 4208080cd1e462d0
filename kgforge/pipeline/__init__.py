"""End-to-end pipeline orchestration."""
