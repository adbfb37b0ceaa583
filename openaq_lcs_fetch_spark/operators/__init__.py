"""Operator library — each module re-expresses one SURVEY.md §2 family
as declarative DataFrame transformations (Catalyst-optimizable)."""
