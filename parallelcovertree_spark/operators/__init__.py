"""Distributed operators (SURVEY.md section 2: joins, aggs, dedup, ANN)."""
