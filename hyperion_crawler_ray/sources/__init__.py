"""Sources & sinks: pruned parquet reads, partitioned writes, and the
keyed snapshot-merge sinks that re-derive the reference's LoadMode family
(insert / upsert / replace / append, api/src/etl/base/loader.py:15-21).
"""
