"""Structured Streaming flavor of the engine (SURVEY.md §2.8).

The reference realizes streaming via cron re-invocation + an S3
high-water-mark checkpoint (cdk/stack.ts:109-141, fetcher/lib/meta.js);
here the same pipelines run as readStream → transform → writeStream
with real watermarks, windows, and streaming dedup."""
