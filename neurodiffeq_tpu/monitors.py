"""Placeholder for the monitors module (implementation in progress this round)."""
