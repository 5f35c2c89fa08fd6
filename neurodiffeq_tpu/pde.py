"""Placeholder for the pde module (implementation in progress this round)."""
