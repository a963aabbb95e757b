"""Plan inspection helpers (explain audits)."""
