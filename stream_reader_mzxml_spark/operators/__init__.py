"""Relational operators: filters, joins, aggregations (SURVEY.md §2.2-2.6)."""
