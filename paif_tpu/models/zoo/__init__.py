"""Comparison-baseline zoos: 6 fusion networks + 3 RGB-T segmentation nets."""
