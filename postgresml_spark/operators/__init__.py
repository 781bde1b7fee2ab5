"""Relational / search / pipeline operators expressed as DataFrame programs."""
