"""Sources: synthetic pages generation and table loaders."""
