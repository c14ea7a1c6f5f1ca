"""Structured Streaming surface (SURVEY §7E): the streaming evolution
of the reference's batch fan-out."""
