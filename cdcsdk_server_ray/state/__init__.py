"""State: checkpoint manifests, lake layout, lineage records."""
