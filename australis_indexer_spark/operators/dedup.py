"""Placeholder — ops land in a later milestone this round."""
