"""Relational + pipeline operators (set-based, shuffle-aware)."""
