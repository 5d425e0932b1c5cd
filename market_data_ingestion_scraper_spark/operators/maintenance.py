"""Table/index maintenance: small-file compaction for append-grown
partitioned parquet layouts.

Every incremental index append (:func:`~.dedup.extend_band_index`,
:func:`~.similarity.extend_ann_index`, the streaming admission sinks)
adds ≥1 parquet file per touched partition directory.  At 100 TB that is
the classic small-files problem: listing becomes metadata-bound, scans
pay per-file open cost, and the "partition pruning reads only its
bucket's files" guarantee erodes into "reads 500 tiny files per bucket".
Compaction folds each partition directory's files into few, full-size
files WITHOUT changing a single row — the layout twin of the streaming
silver compactor (:func:`~..streaming.pipeline.compact_events_silver`),
at file granularity instead of batch-directory granularity.

Crash safety is the same write-ahead source-manifest protocol: (1) the
partition's merged rows land in an underscore-prefixed staging dir
(invisible to readers) with Spark's ``_SUCCESS`` marker plus a
``_compact_manifest.json`` naming exactly the source FILES the snapshot
covers AND the staged snapshot file names — complete only when both
exist; (2) the manifest'd source files are deleted; (3) the staged files
move into the partition dir; (4) the manifest is removed LAST.  A re-run
resumes from whichever step crashed by comparing the manifest against
the current file listing; the recorded staged names let it tell an
already-moved snapshot file from a genuine late append, so no crash
window leaves the sole copy of any row invisible or double-counted.

Single-writer discipline: like the extenders themselves, compaction must
not race concurrent appends to the same partition (an append landing
between snapshot and delete is handled — see the merge branch — but an
append landing DURING the snapshot read is not atomic).  Local paths
only; a cluster deployment drives the same protocol through the Hadoop
FileSystem API.
"""

from __future__ import annotations

import json
import os
import shutil

MANIFEST = "_compact_manifest.json"


def _data_files(d: str) -> list[str]:
    return sorted(
        f for f in os.listdir(d)
        if f.endswith(".parquet") and not f.startswith(("_", "."))
    )


def _staging_complete(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS")) and os.path.exists(
        os.path.join(path, MANIFEST)
    )


def compact_partition_files(
    spark,
    table_dir: str,
    max_files: int = 1,
    max_rows_per_file: int | None = None,
) -> dict[str, int]:
    """Fold each partition directory of ``table_dir`` (or the directory's
    own files when it is unpartitioned, e.g. a split minhash ``sigs/``)
    into ≤ ``max_files`` files (modulo ``max_rows_per_file`` rolling).
    Returns ``{"dirs_compacted": n, "files_removed": n}``.

    Rows are preserved exactly: the snapshot is read from the partition
    dir itself (files inside a ``col=value`` dir don't carry the
    partition column, and the compacted file goes back into the same
    dir, so the on-disk schema is untouched)."""
    from ..util import require_local_path

    require_local_path(table_dir)
    stats = {"dirs_compacted": 0, "files_removed": 0}
    if not os.path.isdir(table_dir):
        return stats
    part_dirs = sorted(
        os.path.join(table_dir, d)
        for d in os.listdir(table_dir)
        if os.path.isdir(os.path.join(table_dir, d)) and "=" in d
    )
    staging_root = os.path.join(table_dir, "_compact_staging")
    for pd in part_dirs or [table_dir]:
        staging = os.path.join(staging_root, os.path.basename(pd))
        merge_staging = staging + ".merge"

        def write_snapshot(paths: list[str], dest: str, covers: list[str]):
            df = spark.read.parquet(*paths)
            w = df.repartition(1).write.mode("overwrite")
            if max_rows_per_file:
                w = w.option("maxRecordsPerFile", max_rows_per_file)
            w.parquet(dest)
            # manifest written after the data: its presence marks the
            # snapshot complete.  It names BOTH sides — the source files
            # it covers and the staged file names it produced — so a
            # resume can tell a moved snapshot file from a late append.
            with open(os.path.join(dest, MANIFEST), "w") as f:
                json.dump(
                    {"covers": sorted(covers), "staged": _data_files(dest)},
                    f,
                )

        def finish(covered: list[str]) -> None:
            # staged snapshot holds every covered row; the deletes and
            # moves below can crash at any point — a re-run resumes here.
            # Order matters: sources out, staged files in, manifest
            # removed LAST, so an interrupted finish always leaves a
            # complete staging dir (never a manifest-less sole copy).
            for name in covered:
                fp = os.path.join(pd, name)
                if os.path.exists(fp):
                    os.remove(fp)
                    stats["files_removed"] += 1
            for name in _data_files(staging):
                os.replace(
                    os.path.join(staging, name), os.path.join(pd, name)
                )
            os.remove(os.path.join(staging, MANIFEST))
            shutil.rmtree(staging)
            stats["dirs_compacted"] += 1

        # a completed .merge generation is a finished re-snapshot that
        # lost its rename — promote it before reading any state
        if _staging_complete(merge_staging):
            shutil.rmtree(staging, ignore_errors=True)
            shutil.move(merge_staging, staging)
        else:
            shutil.rmtree(merge_staging, ignore_errors=True)

        current = _data_files(pd)
        if _staging_complete(staging):
            with open(os.path.join(staging, MANIFEST)) as f:
                manifest = json.load(f)
            # legacy manifests are a bare list of covered sources; under
            # the legacy protocol the manifest was removed before any
            # move, so its presence implies no staged file has moved yet
            if isinstance(manifest, list):
                covered, staged_names = manifest, []
            else:
                covered = manifest["covers"]
                staged_names = manifest.get("staged", [])
            moved = sorted(set(staged_names) & set(current))
            new_files = sorted(
                set(current) - set(covered) - set(staged_names)
            )
            deleted = sorted(set(covered) - set(current))
            if new_files and not deleted and not moved:
                # crash before any deletion: sources intact, snapshot
                # stale but redundant — discard, restart fresh below
                shutil.rmtree(staging)
            elif new_files and not moved:
                # snapshot is the sole copy of `deleted`: fold the
                # surviving new files in via a new generation, then swap
                write_snapshot(
                    [staging] + [os.path.join(pd, n) for n in new_files],
                    merge_staging,
                    covered + new_files,
                )
                shutil.rmtree(staging)
                shutil.move(merge_staging, staging)
                finish(sorted(covered + new_files))
                continue
            else:
                # no late appends, or moves already started (deletes
                # complete, every covered row lives in staging + moved):
                # finish is idempotent from any interruption point
                finish(covered)
                continue
        current = _data_files(pd)
        if len(current) <= max_files:
            continue
        write_snapshot([pd], staging, current)
        finish(current)
    if os.path.isdir(staging_root) and not os.listdir(staging_root):
        os.rmdir(staging_root)
    return stats


def compact_index(spark, index_path: str, **kw) -> dict[str, int]:
    """Compact a persisted index in place, sidecar-aware: the split
    minhash layout compacts ``bands/`` (per band dir) and ``sigs/``
    (flat); lsh/ivf layouts compact their ``t=``/``cell=`` dirs at the
    root.  Rows, schema, and the ``_quantizer.json`` sidecar are
    untouched — serving before and after is identical, just fewer files
    per pruned partition."""
    from ..util import require_local_path

    require_local_path(index_path)
    with open(os.path.join(index_path, "_quantizer.json")) as f:
        quantizer = json.load(f)
    totals = {"dirs_compacted": 0, "files_removed": 0}
    targets = (
        [os.path.join(index_path, "bands"), os.path.join(index_path, "sigs")]
        if quantizer.get("layout") == "split"
        else [index_path]
    )
    for t in targets:
        s = compact_partition_files(spark, t, **kw)
        for k in totals:
            totals[k] += s[k]
    return totals
