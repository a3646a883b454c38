"""Compute kernels: SE(3) math, features, voxel ops, NN search, residuals,
Gauss-Newton solver, deskew."""
