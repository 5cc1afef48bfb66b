"""Reusable column-expression builders (vector math, text analysis)."""
