"""Training: optimizer, checkpoints, trainer loops, metrics."""
