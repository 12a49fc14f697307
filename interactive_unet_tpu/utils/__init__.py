"""Utilities: profiling hooks, torch weight import."""
