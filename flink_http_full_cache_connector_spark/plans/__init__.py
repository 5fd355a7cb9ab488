"""Declarative query shapes (B1-B11 reference query surface as DataFrame plans)."""
