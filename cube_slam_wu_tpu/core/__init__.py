"""Core math: rotations, SE(3) Lie group, 9-DoF cuboids, camera models."""
