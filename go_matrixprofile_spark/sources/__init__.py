"""Sources: deterministic transcript corpus generator + loaders."""
