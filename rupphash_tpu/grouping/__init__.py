"""Duplicate grouping: MXU edge search + host clustering semantics."""
