"""Placeholder — filled in by later milestone."""
