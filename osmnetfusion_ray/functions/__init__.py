"""Scalar / batch kernels: hashing, tag cleaning, text analysis."""
