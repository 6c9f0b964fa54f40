"""Multi-chip parallelism: device meshes and sharding rules for the CC tensors."""
