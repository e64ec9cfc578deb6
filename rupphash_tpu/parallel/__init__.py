"""Multi-chip scaling: device meshes, sharded hashing, sharded grouping."""
