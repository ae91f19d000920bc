"""Placeholder — queries added in M1+."""
