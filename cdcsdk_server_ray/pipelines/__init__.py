"""Pipelines: oracle-checkable operator surfaces over the test tables."""
