"""Host utilities: profiling, logging."""
