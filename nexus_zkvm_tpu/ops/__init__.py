"""Compute kernels: field arithmetic, circle FFT, hashing, Merkle, LogUp, FRI."""
