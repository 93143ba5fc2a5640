"""Detection geometry: adjacency graphs, graph-constrained RANSAC, rigid poses.

TPU-native rebuild of the reference's src/common geometric core
(SURVEY.md section 2 components 8-11) as vectorized, jit-compatible functions:
fixed hypothesis batches instead of adaptive sequential RANSAC, boolean
adjacency matrices + masks instead of mutated sorted neighbor lists, and a
Newton-iteration polar decomposition instead of a per-sample SVD.
"""
