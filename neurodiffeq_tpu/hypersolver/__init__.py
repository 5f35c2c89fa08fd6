"""Placeholder for the hypersolver subpackage (implementation in progress)."""
