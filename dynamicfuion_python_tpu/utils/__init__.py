"""Utilities: typed config tree, tensor IO, telemetry."""
