"""Placeholder for the temporal module (implementation in progress this round)."""
