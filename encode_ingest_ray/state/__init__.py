"""Stateful core of the CDC engine: LWW merge kernel, salted partitioner,
two-phase manifest commit log, and the partition-merger actor pool."""
