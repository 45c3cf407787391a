"""Host-side utilities: dataset IO, profiling, metrics, visualization."""
