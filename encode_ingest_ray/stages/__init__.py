"""Stateless per-batch operators (SURVEY.md §2.2) — all vectorized
pyarrow.compute kernels designed to run inside ``Dataset.map_batches`` with
``batch_format="pyarrow"`` / ``zero_copy_batch=True``."""
