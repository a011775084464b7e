"""Deterministic re-creations of the reference's canonical test
fixtures (reconstructed from golden plan constraints — see
fixtures/even_spread.py)."""
