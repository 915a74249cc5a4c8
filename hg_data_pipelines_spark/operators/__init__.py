"""Composite operators the DataFrame API lacks as single calls.

Each is built from shuffle-conscious primitives (window functions, bucketed
joins, LSH) rather than naive cross joins — these are the 100-TB-safe forms.
"""
