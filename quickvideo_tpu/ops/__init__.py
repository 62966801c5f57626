"""Compute ops: token-importance predictors, prune/compact, attention, KV cache."""
