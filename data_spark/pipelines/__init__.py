"""Document-source pipelines (SURVEY §3.2/3.3 and §2.8 struct/array
surface): twitter, facebook ads, news sources, lobbying filings.

Each module takes enveloped document DataFrames (schemas mirror
FIXTURES.md §2) and produces the reference's derived relations — entity
tables for the graph, scored/cleaned source lists, exploded ``_nested``
side tables — as single declarative projections instead of per-doc
Python loops.
"""
