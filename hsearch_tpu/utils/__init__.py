"""Aux subsystems: tracing, checkpointing, observability."""
