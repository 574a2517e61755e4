"""Host-side utilities: profiling, device monitoring, checkpointing."""
