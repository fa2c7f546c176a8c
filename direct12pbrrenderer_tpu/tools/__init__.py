"""Committed measurement tooling (profiling, microbenchmarks)."""
