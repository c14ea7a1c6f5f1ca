"""Filled in below (round 2)."""
