"""Placeholder for the callbacks module (implementation in progress this round)."""
