"""Placeholder — operators land in a subsequent milestone."""
