"""Compute ops: geodesic integration, sampling, shading, noise, lens FX."""
