"""Placeholder for the ode module (implementation in progress this round)."""
