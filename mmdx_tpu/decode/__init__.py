"""Jit-compiled autoregressive decoding: greedy + beam search with HF semantics."""
