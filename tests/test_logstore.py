"""LogStore substrate-independence: the SAME commit-protocol scenarios
(CAS one-winner, stale takeover + lease revocation, conflict-retry
MERGE serializability, concurrent appends, expire's guarded swap) run
parameterized over BOTH substrates — the POSIX store (mkdir/rename,
the default) and the simulated object store (single-object
conditional-PUT CAS, copy+delete moves, no mkdir, no atomic rename).
This is the round-11 verdict's top item: the governed table's
atomicity must not silently depend on POSIX primitives the reference's
real substrate (S3, /root/reference/app.py:461-463) does not have."""

from __future__ import annotations

import glob
import os
import threading
import time

import pytest
from pyspark.sql import functions as F

from aws_seismic_data_pipeline_spark.sources.table import _verbs as R
from aws_seismic_data_pipeline_spark.sources.table.logstore import (
    ObjectStoreLogStore,
    PosixLogStore,
    log_store_for,
    set_log_store,
)

from .conftest import SF_DIR


@pytest.fixture(params=["posix", "object"])
def store_kind(request):
    return request.param


def _use_store(kind: str, mpath: str):
    """Route mpath's commit primitives through the requested store;
    caller must call set_log_store(mpath, None) in teardown."""
    if kind == "object":
        set_log_store(mpath, ObjectStoreLogStore())
    else:
        set_log_store(mpath, PosixLogStore())


@pytest.fixture
def governed(spark, tmp_path, store_kind):
    """A small governed docs table whose manifest runs on the
    parameterized store; yields (mpath, docs_df)."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    )
    data_dir = str(tmp_path / "docs")
    docs.repartition(4, "doc_id").write.parquet(data_dir)
    files = sorted(glob.glob(data_dir + "/*.parquet"))
    mpath = str(tmp_path / "manifest")
    _use_store(store_kind, mpath)
    try:
        R.write_stats_manifest(spark, files, mpath, ("doc_id",))
        yield mpath, docs
    finally:
        set_log_store(mpath, None)


def test_cas_one_winner(spark, governed, store_kind):
    """Two claims of the same snapshot id: exactly one wins, the loser
    raises in-flight — on either substrate."""
    mpath, _docs = governed
    assert R.claim_commit(spark, mpath, 0) == 1
    with pytest.raises(R.ConcurrentCommitError, match="in-flight"):
        R.claim_commit(spark, mpath, 0, stale_after=3600.0)
    token = os.path.join(mpath, "_commits", "1")
    store = log_store_for(mpath)
    # the object store's token is a single OBJECT carrying the owner —
    # claim and ownership in one atomic write; posix keeps the dir+file
    if store_kind == "object":
        assert os.path.isfile(token)
    else:
        assert os.path.isdir(token)
    assert store.read_token_owner(token)
    # released leases are re-claimable
    R.release_claim(mpath, 1)
    assert R.claim_commit(spark, mpath, 0) == 1


def test_stale_takeover_revokes_old_owner(spark, governed):
    """Lease-timeout recovery: a token older than stale_after is taken
    over by a new claimant (one winner), and the ORIGINAL claimant's
    commit-time verify_claim fails loudly instead of interleaving two
    writers' rows under one id."""
    mpath, _docs = governed
    assert R.claim_commit(spark, mpath, 0) == 1
    owner_a = R._CLAIM_OWNERS[(os.path.abspath(mpath), 1)]
    time.sleep(0.15)
    # second claimant: the 0.1s stale window lets it take over
    assert R.claim_commit(spark, mpath, 0, stale_after=0.1) == 1
    # restore A's process-local lease record — A is a separate process
    # in production and still BELIEVES it owns snapshot 1
    R._CLAIM_OWNERS[(os.path.abspath(mpath), 1)] = owner_a
    with pytest.raises(R.ConcurrentCommitError, match="revoked"):
        R.verify_claim(mpath, 1)
    # the revoked token went ASIDE (auditable), not deleted
    asides = [
        n
        for n in log_store_for(mpath).list_tokens(
            os.path.join(mpath, "_commits")
        )
        if ".stale-" in n
    ]
    assert asides


def test_merge_conflict_retry_serializes(spark, governed):
    """The optimistic-concurrency MERGE scenario: writer A commits,
    writer B's claim of the same snapshot loses, the retry wrapper
    re-plans and the outcome equals the SERIAL A-then-B application —
    identical guarantees on either substrate."""
    mpath, docs = governed
    delta_a = spark.createDataFrame([(3, "aa")], "doc_id long, lang string")
    delta_b = spark.createDataFrame(
        [(3, "bb"), (10**7, "nb")], "doc_id long, lang string"
    )
    snap_a, _, _, retries_a = R.merge_with_conflict_retry(
        spark, mpath, delta_a, "doc_id", ["lang"]
    )
    assert (snap_a, retries_a) == (1, 0)
    with pytest.raises(R.ConcurrentCommitError):
        R.claim_commit(spark, mpath, 0)
    snap_b, _, _, retries_b = R.merge_with_conflict_retry(
        spark, mpath, delta_b, "doc_id", ["lang"]
    )
    assert snap_b == snap_a + 1 and retries_b == 0
    final = {
        r.doc_id: r.lang
        for r in R.read_with_deletes(spark, mpath, "doc_id").collect()
    }
    assert final[3] == "bb" and final[10**7] == "nb"
    assert len(final) == docs.count() + 1


def test_concurrent_append_threads_serialize(spark, tmp_path, store_kind):
    """Two REAL concurrent appenders race the CAS from separate
    threads (no injected failures): every batch registers exactly once,
    snapshot ids are all distinct, and no row is lost or duplicated."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "lang"
    )
    mpath = str(tmp_path / "manifest")
    _use_store(store_kind, mpath)
    try:
        seed = str(tmp_path / "seed")
        docs.limit(0).coalesce(1).write.parquet(seed)
        R.write_stats_manifest(
            spark, sorted(glob.glob(seed + "/*.parquet")), mpath, ("doc_id",)
        )
        batches = []
        for i in range(4):
            bdir = str(tmp_path / f"batch_{i}")
            docs.filter(F.col("doc_id") % 4 == i).coalesce(1).write.parquet(
                bdir
            )
            batches.append(sorted(glob.glob(bdir + "/*.parquet")))
        results, errors = [], []

        def appender(my_batches):
            try:
                for files in my_batches:
                    # max_retries above the default: under full-suite
                    # load the winner's commit can outlast the default
                    # ~1.5s backoff budget and flake the loser out
                    results.append(
                        R.append_stats_manifest_retry(
                            spark, files, mpath, ("doc_id",), max_retries=10
                        )
                    )
            except Exception as e:  # pragma: no cover - surfaced below
                errors.append(e)

        t1 = threading.Thread(target=appender, args=(batches[:2],))
        t2 = threading.Thread(target=appender, args=(batches[2:],))
        t1.start(), t2.start()
        t1.join(), t2.join()
        assert not errors, errors
        snaps = sorted(s for s, _ in results)
        # all distinct and gap-free: the serial order of commits
        assert snaps == list(range(snaps[0], snaps[0] + 4))
        got = R.manifest_pruned_scan(spark, mpath, "doc_id", 0, 10**12)
        assert got.count() == docs.count()
        assert (
            got.select(F.sum("doc_id")).first()[0]
            == docs.select(F.sum("doc_id")).first()[0]
        )
    finally:
        set_log_store(mpath, None)


def test_expire_swap_under_lease(spark, governed, store_kind, tmp_path):
    """Expire's guarded swap on either substrate: the claim lease
    excludes writers, a claim during the swap window raises retryable
    (never resurrects the manifest dir), live tokens above the guard
    survive the swap, and post-expire reads are intact. The object
    store performs the swap as copy+delete — valid exactly because of
    the lease."""
    mpath, docs = governed
    ins = spark.createDataFrame([(10**7, "xx")], "doc_id long, lang string")
    snap1, _, _ = R.merge_through_manifest(spark, mpath, ins, "doc_id", ["lang"])
    assert snap1 == 1
    # an exotic in-flight lease ABOVE the guard survives the swap
    assert R.claim_commit(spark, mpath, 2) == 3
    n_before = R.read_with_deletes(spark, mpath, "doc_id").count()
    before, after = R.expire_manifest_history(spark, mpath, expire_below=1)
    assert before > 0 and after > 0
    commits = os.path.join(mpath, "_commits")
    names = log_store_for(mpath).list_tokens(commits)
    assert "3" in names, "in-flight token must survive the swap"
    assert "2" not in names, "expire must release its swap guard"
    assert R.read_with_deletes(spark, mpath, "doc_id").count() == n_before
    # swap window: claims fail retryably instead of recreating the dir
    aside = mpath + ".expired_old"
    log_store_for(mpath).move_dir(mpath, aside)
    with pytest.raises(R.ConcurrentCommitError, match="does not exist"):
        R.claim_commit(spark, mpath, 1)
    assert not os.path.isdir(mpath)
    # crash recovery heals the stranded manifest on either substrate
    assert R.recover_interrupted_expire(mpath) is True
    assert R.read_with_deletes(spark, mpath, "doc_id").count() == n_before
