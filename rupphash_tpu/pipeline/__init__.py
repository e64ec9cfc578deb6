"""Host data plane: walk, decode, extract, batch, orchestrate."""
