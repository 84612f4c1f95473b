"""Config tree, profiling, visualization, checkpointing."""
