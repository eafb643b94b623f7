"""Relational / windowed operators of the point-in-time layer."""
