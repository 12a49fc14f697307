"""Workload drivers: training, inference, suggestor, checkpointing, history."""
