"""Numerical building blocks: rotations, the batched IPM QP solver, Pallas kernels."""
