"""Column-level helper functions (all built-in Catalyst expressions)."""
