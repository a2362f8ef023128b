"""Operator library: DataFrame transform functions (SURVEY.md §2).

Every operator is a pure function ``DataFrame -> DataFrame`` (usable with
``df.transform(...)``) built from Column expressions so Catalyst can push
filters, prune columns, and pick join strategies. Pandas UDFs appear only
where built-ins genuinely cannot express the semantics (geometry kernels).
"""
