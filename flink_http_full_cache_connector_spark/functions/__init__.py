"""Column-level helper functions (portable hashing, vector math, text stats)."""
