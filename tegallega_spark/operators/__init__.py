"""Relational + ML-data operators (SURVEY.md §2.3-2.7 and §7 extensions)."""
