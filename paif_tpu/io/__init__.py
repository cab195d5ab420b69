"""IO: torch-checkpoint import, Orbax checkpoints, image read/write."""
