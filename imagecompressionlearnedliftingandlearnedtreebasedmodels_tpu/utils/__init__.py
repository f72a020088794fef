"""Support utilities: plotting, profiling, notification."""
