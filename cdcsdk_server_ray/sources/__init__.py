"""Sources: deterministic changelog synthesis + source-table adapters."""
