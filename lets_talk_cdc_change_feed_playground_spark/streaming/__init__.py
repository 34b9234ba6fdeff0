"""Structured Streaming execution mode: stateful capture engines (log,
polling, trigger), transaction assembly, watermark-gated apply-on-commit,
idempotent upsert sink, deterministic workload generator, and the pipeline
lifecycle controller."""
