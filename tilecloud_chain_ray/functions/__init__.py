"""Scalar/vector function library: cells, hashing, text metrics."""
