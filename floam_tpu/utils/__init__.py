"""Aux subsystems: checkpointing, profiling, logging."""
