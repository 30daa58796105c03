"""Runtime subsystems: checkpointing, profiling, optimizers."""
