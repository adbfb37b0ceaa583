"""Source connectors (SURVEY.md §2.1 S1-S8): file scans, a paginated
HTTP DataSource with partition-per-page parallelism, and the
checkpoint/high-water-mark store."""
