"""Vectorized image / line / proposal tensor ops (the TPU compute path)."""
