"""Populated incrementally."""
