"""Relational + dataflow operators (SURVEY.md §2)."""
