"""Relational / dataflow operators around the extraction kernel."""
