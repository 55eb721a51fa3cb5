"""Sinks (SURVEY.md section 2.1 S2/S6-S9)."""
