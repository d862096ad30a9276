"""Utilities: stage timing / profiling."""
