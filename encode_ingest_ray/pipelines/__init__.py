"""Pipelines: the CDC epoch driver plus reference-shaped Dataset pipelines."""
