"""Iterative driver-loop utilities: run directories, metrics, lineage."""
