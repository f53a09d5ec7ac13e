"""Frontier operators: priority, politeness, robots, dedup (exact + bloom)."""
