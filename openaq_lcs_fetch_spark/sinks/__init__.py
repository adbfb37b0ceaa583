"""Sink connectors (SURVEY.md §2.1 K1-K6): gzipped CSV/JSON measures
sinks, the diff-upsert station registry, and run-log side outputs."""
