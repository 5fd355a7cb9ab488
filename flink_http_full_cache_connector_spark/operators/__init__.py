"""Operators: lookup join + large-scale pipeline ops (dedup/similarity/text/multimodal)."""
