"""Placeholder for the pde_spherical module (implementation in progress this round)."""
