"""Entry-point applications: fusion pipeline, train/generate/evaluate."""
