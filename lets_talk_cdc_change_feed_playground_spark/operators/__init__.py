"""Batch CDC operators: capture engines, event-bus playground, diff/verify
analytics, metrics, and schema evolution. See COVERAGE.md for the map to the
reference inventory."""
