"""Compute kernels: geometry, clustering, stereo matching, flow warping."""
