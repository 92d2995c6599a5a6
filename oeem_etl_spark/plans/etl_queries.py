"""Placeholder — filled in as the corresponding SURVEY.md §2 tier lands."""
