import os

if os.environ.get("RUPPHASH_PLATFORM"):
    # Select the JAX backend before any computation initializes one.
    # Useful for CPU-only runs (JAX_PLATFORMS can arrive too late when
    # the interpreter's sitecustomize pre-imports jax to register a
    # TPU plugin; jax.config still works until a backend exists).
    import jax

    jax.config.update("jax_platforms", os.environ["RUPPHASH_PLATFORM"])

from .cli import main

if __name__ == "__main__":
    raise SystemExit(main())
