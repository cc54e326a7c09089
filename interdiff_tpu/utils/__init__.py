"""Utilities: torch-checkpoint conversion, config, logging."""
