"""Catalyst-native operator library: deduplication, similarity search, and
text-quality functions for large-scale training-data pipelines. All pure
column expressions / DataFrame transforms — no Python UDFs in any hot path.
"""
