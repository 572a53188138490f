"""End-to-end pipelines (reference-parity GTFS build)."""
