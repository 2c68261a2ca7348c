"""Relational battery (SURVEY.md §2.2/§2.5/§2.7) — filled in next milestones."""
