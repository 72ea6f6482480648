"""Dataset -> Dataset operator library (SURVEY.md §2), Ray-Data-first.

Every operator here is a thin composition over ``map_batches`` /
``groupby`` / ``sort`` with vectorized (pyarrow.compute / numpy / pandas)
batch bodies — no per-row Python in hot paths. Stateless ops are plain
functions; stages with real setup cost are callable classes run as actor
pools.
"""
