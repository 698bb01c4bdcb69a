"""Placeholder — populated in this round."""

QUERIES = {}
ORACLE = {}
