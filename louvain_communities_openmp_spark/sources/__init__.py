"""Sources: synthetic pages generator, edge-table builders, checkpoints."""
