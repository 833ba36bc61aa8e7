"""Stateless compute ops (JAX/XLA + Pallas kernels)."""
