"""Table-format engine (round-11 split of ``sources/readers.py``):

- ``commit`` — snapshot CAS tokens, leases, ConcurrentCommitError
- ``manifest`` — stats rows, tombstones, visibility, pruned/as-of scans
- ``evolution`` — schema ADD COLUMN as commits, evolved reads
- ``deletes`` — equality/retention deletes + their compaction
- ``maintenance`` — CoW merge, compaction, vacuum, expire, clone, rollback
- ``sketches`` — KMV NDV and Bloom manifests
- ``facade`` — :class:`GovernedTable`, the user-facing handle
"""

from aws_seismic_data_pipeline_spark.sources.table.facade import GovernedTable

__all__ = ["GovernedTable"]
