"""Observability and utilities (reference: src/util/)."""
