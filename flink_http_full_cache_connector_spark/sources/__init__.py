"""Sources: HTTP full-cache lookup table, Python Data Source, datagen shim."""
