"""Stateless ``map_batches`` transforms (Arrow in / Arrow out)."""
