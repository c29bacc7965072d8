"""Plan-audit utilities."""
