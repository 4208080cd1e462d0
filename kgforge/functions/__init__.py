"""Column-level derived functions (reference public API surface)."""
