"""Pallas TPU kernels (the native compute tier of the framework)."""
