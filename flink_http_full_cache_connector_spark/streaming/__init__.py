"""Streaming: FIXED_DELAY refresh manager, stream-static enrichment pipeline."""
