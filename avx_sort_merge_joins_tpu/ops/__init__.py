"""Operator kernels (reference: src/avxsort, src/merge, src/partition,
src/scalarsort, src/joins scalar merge_join)."""
