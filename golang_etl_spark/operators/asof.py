"""Placeholder — implemented later this round."""
