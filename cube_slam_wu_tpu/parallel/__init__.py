"""Multi-chip scaling: device meshes, sharded bundle adjustment."""
