"""graphgym_tpu: a TPU-native GNN message-passing framework.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of
GraphGym + the ID-GNN reproduction fork (reference layout mapped in
SURVEY.md): config-driven GNN design space, sparse message-passing
kernels, ID-GNN Fast/Full, experiment management, and multi-chip
edge-partitioned execution over a jax.sharding.Mesh.
"""

__version__ = "0.1.0"
