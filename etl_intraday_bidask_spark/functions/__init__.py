"""Reusable column-expression helpers (vector math, text analysis)."""
