"""Offline conversion utilities (weight import, one-off migrations)."""
