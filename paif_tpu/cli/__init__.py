"""Command-line entry points mirroring the reference scripts:
test_original (clean eval), robust_test (PGD-robust eval), train_aat."""
