"""Structured Streaming surface (beyond-reference extension;
SURVEY.md §2.9: the reference is pure batch)."""
