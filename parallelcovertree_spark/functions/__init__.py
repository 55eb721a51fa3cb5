"""Scalar/vectorized function surface (SURVEY.md section 2.7)."""
