"""Host-side data pipeline: dataset loaders, canonicalization, constants."""
