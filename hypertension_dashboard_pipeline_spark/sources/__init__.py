"""Table registries and codelist handling."""
