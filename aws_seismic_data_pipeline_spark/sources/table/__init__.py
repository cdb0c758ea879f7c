"""Table-format engine (round-11 split of ``sources/readers.py``):

- ``commit`` — snapshot CAS tokens, leases, ConcurrentCommitError
- ``manifest`` — stats rows, tombstones, visibility, pruned/as-of scans
- ``evolution`` — schema ADD COLUMN as commits, evolved reads
- ``deletes`` — equality/retention deletes + their compaction
- ``maintenance`` — CoW merge, compaction, vacuum, expire, clone, rollback
- ``sketches`` — KMV NDV and Bloom manifests
- ``logstore`` — pluggable commit-atomicity substrate (POSIX default,
  simulated object store for S3-honest CAS/swap semantics)
- ``facade`` — :class:`GovernedTable`, the user-facing handle
"""

from aws_seismic_data_pipeline_spark.sources.table.facade import GovernedTable
from aws_seismic_data_pipeline_spark.sources.table.logstore import (
    ObjectStoreLogStore,
    PosixLogStore,
    log_store_for,
    set_log_store,
)

__all__ = [
    "GovernedTable",
    "ObjectStoreLogStore",
    "PosixLogStore",
    "log_store_for",
    "set_log_store",
]
