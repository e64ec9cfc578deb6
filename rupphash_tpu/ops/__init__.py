"""Hash kernels: golden (numpy, exact semantics) and TPU (JAX/Pallas) paths."""
