"""Iterative plans: level-batched cover-tree build, checkpoints, tree queries."""
