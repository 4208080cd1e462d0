"""SHACL shape-metadata extraction (reference-parity semantics)."""
