"""Sources: REST fetch stage, JSON fixtures, geo dimension."""
