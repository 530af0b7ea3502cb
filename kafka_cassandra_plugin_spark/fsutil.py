"""Tiny Hadoop-FS helpers shared by the disk-backed index/model types.

Every batch-partitioned store (BloomIndex, NgramLM, Bm25Index,
CommonnessIndex, WordHistogram, FingerprintIndex, MinHashIndex) needs
the same filesystem moves around its ``batch=<id>`` layout: existence
checks, recursive deletes, and a staged-sibling swap whose crash
behavior is RECOVERABLE.  Kept in one module so the discipline is
uniform - and auditable in one place.

Swap protocol (:func:`staged_fold_swap`) - the crash-safety core.  A
fold-compaction replaces a table directory ``t`` with {one freshly
written folded partition} + {a set of kept partitions carried through
verbatim}.  The naive sibling swap (write sibling, rename keeps in,
delete ``t``, rename sibling over) is destructive on crash-retry: once
keeps have been RENAMED into the sibling, a retry that blind-deletes
the sibling erases them - they no longer exist anywhere else.  The
protocol here makes every window recoverable with two empty marker
files inside the sibling (underscore-prefixed, so Spark's file index
ignores them if they are ever observed inside a live table dir):

1. ``recover_fold_swap(t)``      - finish or undo any prior attempt
2. delete sibling                - contains nothing of value after (1)
3. write folded partition        -> ``t__compacting/batch=<fold_id>``
4. touch ``_FOLD_LEVEL=<fold_id>``  (names which partition is DERIVED
                                     data; its absence proves no keeps
                                     have been renamed in yet)
5. rename each keep              -> ``t__compacting/batch=<keep_id>``
6. touch ``_COMMITTED``          (the commit point: sibling is the
                                  complete next state)
7. delete ``t``                  (only folded-away partitions remain)
8. rename sibling -> ``t``
9. delete the two markers

Recovery decision table (:func:`recover_fold_swap`), for a crash at
any point - each state is distinguishable on disk:

- sibling absent: nothing in flight (clean stray markers from a crash
  inside step 9).
- sibling present, ``_COMMITTED`` present (crash in 6-8): roll
  FORWARD - delete ``t``, rename sibling over, clean markers.
- sibling present, no ``_COMMITTED``, ``_FOLD_LEVEL`` present (crash
  in 4-5): roll BACK - rename every ``batch=`` dir EXCEPT the fold
  level back into ``t`` (those are the original keeps; the fold level
  is derived data), then delete the sibling.
- sibling present, neither marker (crash in 2-3): the sibling holds
  only a partial fold write - delete it.
- sibling present, no marker, ``t`` ABSENT: legacy pre-marker crash
  shape (old swap's delete-then-rename window); the sibling was
  complete before ``t`` was deleted, so roll forward.

``rename_or_raise`` additionally REFUSES an existing destination:
Hadoop's local rename onto an existing directory nests the source
inside it (producing ``batch=-1/batch=-1`` and
CONFLICTING_PARTITION_COLUMN_NAMES at read time) instead of failing.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame, SparkSession

COMMIT_MARKER = "_COMMITTED"
FOLD_MARKER_PREFIX = "_FOLD_LEVEL="
COMPACTING_SUFFIX = "__compacting"


def _fs_and_path(spark: SparkSession, path: str):
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(conf), hpath, jvm


def path_exists(spark: SparkSession, path: str) -> bool:
    fs, hpath, _ = _fs_and_path(spark, path)
    return fs.exists(hpath)


def delete_dir(spark: SparkSession, path: str) -> bool:
    """Recursively delete ``path`` if it exists; True if something was
    deleted.  The pre-write cleanup a consolidated ``save()`` needs so
    stale ``batch=<id>`` partitions from a previous life of the path
    cannot silently merge into the new model's loaded view.  NEVER call
    this on a ``__compacting`` sibling without running
    :func:`recover_fold_swap` first - the sibling may hold renamed-in
    original partitions."""
    fs, hpath, _ = _fs_and_path(spark, path)
    if fs.exists(hpath):
        return bool(fs.delete(hpath, True))
    return False


def delete_file(spark: SparkSession, path: str) -> bool:
    """Non-recursive delete of a single file (marker cleanup)."""
    fs, hpath, _ = _fs_and_path(spark, path)
    if fs.exists(hpath):
        return bool(fs.delete(hpath, False))
    return False


def touch(spark: SparkSession, path: str) -> None:
    """Create an empty file (overwrite allowed) - the swap protocol's
    marker primitive."""
    fs, hpath, _ = _fs_and_path(spark, path)
    fs.create(hpath, True).close()


def list_batch_ids(spark: SparkSession, path: str) -> list[int]:
    """Sorted batch ids of the ``batch=<id>`` partition dirs under
    ``path`` (empty list when none)."""
    fs, hpath, jvm = _fs_and_path(spark, path)
    glob = jvm.org.apache.hadoop.fs.Path(f"{path}/batch=*")
    ids = []
    for status in fs.globStatus(glob) or []:
        name = status.getPath().getName()
        try:
            ids.append(int(name.split("=", 1)[1]))
        except ValueError:
            continue
    return sorted(ids)


def rename_or_raise(spark: SparkSession, src: str, dst: str) -> None:
    """``fs.rename`` with BOTH failure modes checked: Hadoop's rename
    reports failure by returning false (ignoring it turns the swap's
    subsequent delete into silent data loss), and a rename onto an
    EXISTING directory silently nests the source inside it (corrupting
    hive partition layouts) instead of failing - refused here."""
    fs, hsrc, jvm = _fs_and_path(spark, src)
    hdst = jvm.org.apache.hadoop.fs.Path(dst)
    if fs.exists(hdst):
        raise IOError(
            f"rename {src} -> {dst}: destination already exists "
            "(a rename onto an existing dir would nest, not replace)"
        )
    if not fs.rename(hsrc, hdst):
        raise IOError(f"rename {src} -> {dst} failed")


def _fold_marker_level(spark: SparkSession, tmp: str) -> int | None:
    """The fold level recorded by a ``_FOLD_LEVEL=<id>`` marker file
    under ``tmp``, or None when no marker exists."""
    fs, hpath, _ = _fs_and_path(spark, tmp)
    if not fs.exists(hpath):
        return None
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if name.startswith(FOLD_MARKER_PREFIX):
            try:
                return int(name[len(FOLD_MARKER_PREFIX):])
            except ValueError:
                continue
    return None


def _clean_markers(spark: SparkSession, tdir: str) -> None:
    """Remove swap markers that ended up inside a LIVE table dir (a
    crash between the final rename and marker cleanup).  Harmless to
    readers while present (underscore prefix), removed for hygiene."""
    fs, hpath, _ = _fs_and_path(spark, tdir)
    if not fs.exists(hpath):
        return
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if name == COMMIT_MARKER or name.startswith(FOLD_MARKER_PREFIX):
            fs.delete(status.getPath(), False)


def recover_fold_swap(spark: SparkSession, tpath: str) -> str:
    """Finish or undo an interrupted :func:`staged_fold_swap` on table
    dir ``tpath`` (decision table in the module doc).  Idempotent; must
    run before any new swap attempt touches the sibling.  Returns one
    of ``"clean"``, ``"rolled_forward"``, ``"rolled_back"``,
    ``"dropped_partial"``."""
    tmp = f"{tpath}{COMPACTING_SUFFIX}"
    if not path_exists(spark, tmp):
        _clean_markers(spark, tpath)
        return "clean"
    if path_exists(spark, f"{tmp}/{COMMIT_MARKER}"):
        # commit point passed: the sibling IS the next state
        delete_dir(spark, tpath)
        rename_or_raise(spark, tmp, tpath)
        _clean_markers(spark, tpath)
        return "rolled_forward"
    fold_level = _fold_marker_level(spark, tmp)
    if fold_level is None:
        if not path_exists(spark, tpath):
            # legacy pre-marker swap shape: live dir already deleted,
            # sibling complete by the old protocol's ordering
            rename_or_raise(spark, tmp, tpath)
            _clean_markers(spark, tpath)
            return "rolled_forward"
        # crash before any keep could move: sibling holds only a
        # (possibly partial) fold write - derived data, safe to drop
        delete_dir(spark, tmp)
        return "dropped_partial"
    # keeps may have moved in; every batch dir except the recorded
    # fold level is an ORIGINAL - move them home, drop the fold
    for i in list_batch_ids(spark, tmp):
        if i == fold_level:
            continue
        rename_or_raise(spark, f"{tmp}/batch={i}", f"{tpath}/batch={i}")
    delete_dir(spark, tmp)
    return "rolled_back"


def recover_tables(spark: SparkSession, path: str,
                   names: Sequence[str]) -> None:
    """:func:`recover_fold_swap` over a store's table dirs - the
    one-exists-check-per-table hook every ``load()`` AND every
    ``compact()`` entry calls, so any interrupted swap is fully healed
    (forward or back) BEFORE a reader resolves its file listing or a
    new fold reads the live dir.  Healing at load time matters for
    compaction too: a fold that read the live dir while original
    partitions still sat in an uncommitted sibling would silently
    omit them from the rewrite.  The swap contract already forbids
    concurrent readers during compaction, so full recovery here is
    race-free by the same contract."""
    for name in names:
        recover_fold_swap(spark, f"{path}/{name}")


def staged_fold_swap(spark: SparkSession, tpath: str, fold_batch_id: int,
                     write_fold: Callable[[str], None],
                     keep_ids: Sequence[int] = ()) -> None:
    """Replace table dir ``tpath`` with {``write_fold``'s output as
    ``batch=<fold_batch_id>``} + {``keep_ids``'s partitions carried
    through as verbatim renames}, crash-recoverable at every step (the
    9-step protocol in the module doc).  ``write_fold(dest)`` must
    write the folded parquet data to ``dest``; keep ids whose dir does
    not exist are skipped (an in-flight batch may have written nothing
    yet).  The fold write may lazily READ ``tpath`` - originals are
    not touched until the write has completed."""
    tmp = f"{tpath}{COMPACTING_SUFFIX}"
    recover_fold_swap(spark, tpath)
    delete_dir(spark, tmp)
    write_fold(f"{tmp}/batch={int(fold_batch_id)}")
    touch(spark, f"{tmp}/{FOLD_MARKER_PREFIX}{int(fold_batch_id)}")
    for i in keep_ids:
        if int(i) == int(fold_batch_id):
            raise ValueError(
                f"keep id {i} collides with fold batch id {fold_batch_id}"
            )
        if path_exists(spark, f"{tpath}/batch={int(i)}"):
            rename_or_raise(spark, f"{tpath}/batch={int(i)}",
                            f"{tmp}/batch={int(i)}")
    touch(spark, f"{tmp}/{COMMIT_MARKER}")
    delete_dir(spark, tpath)
    rename_or_raise(spark, tmp, tpath)
    delete_file(spark, f"{tpath}/{COMMIT_MARKER}")
    delete_file(spark, f"{tpath}/{FOLD_MARKER_PREFIX}{int(fold_batch_id)}")


def staged_replace(spark: SparkSession, tpath: str,
                   write_replacement: Callable[[str], None]) -> None:
    """Full-replacement variant of :func:`staged_fold_swap` for stores
    whose compaction rewrites EVERYTHING from a full read (MinHashIndex
    bands/shingles, IvfIndex assigned lists) - no original partitions
    are renamed into the sibling, so roll-BACK is just dropping the
    derived sibling; the commit marker still makes the
    delete-then-rename window roll FORWARD on retry instead of leaving
    a missing live dir.  ``write_replacement(dest)`` writes the new
    table contents to ``dest``; it may lazily READ ``tpath`` (originals
    are untouched until the write completes)."""
    tmp = f"{tpath}{COMPACTING_SUFFIX}"
    recover_fold_swap(spark, tpath)
    delete_dir(spark, tmp)
    write_replacement(tmp)
    touch(spark, f"{tmp}/{COMMIT_MARKER}")
    delete_dir(spark, tpath)
    rename_or_raise(spark, tmp, tpath)
    delete_file(spark, f"{tpath}/{COMMIT_MARKER}")


def tiered_compact_tables(spark: SparkSession, path: str, tables,
                          exclude_batch: int | None = None,
                          max_levels: int = 8) -> str:
    """LSM-style tiered fold of an index's ``batch=<id>`` tables: fold
    ONLY the young (``batch >= 0``, minus ``exclude_batch``) partitions
    into one new negative LEVEL partition, carrying every existing
    level - and the excluded in-flight batch - through the swap as
    verbatim directory renames (no data read).  This is the answer to
    the full ``compact()``'s one growth term: a full fold rewrites the
    whole accumulated history every cadence (measured 111 -> 176 s
    across a 5M-doc campaign), while a tiered fold's write cost is
    bounded by data appended SINCE the last fold - flat per cadence.

    Losslessness rests on the property every caller's ``load()``
    already has: the stored tables are distributive (postings/
    fingerprints concatenate, counts sum, bitsets OR) and the read
    path re-aggregates across batch partitions - so multiple negative
    levels read exactly like multiple positive batches.  Real batch
    ids are non-negative, so ``load(exclude_batch=N)`` can never hide
    a level, and the per-table ``fold`` callables shrink each level to
    its aggregated form using ONLY young rows (O(recent) work).

    ``tables``: sequence of ``(name, schema, partition_cols, fold)``
    where ``schema`` is the declared read schema INCLUDING the
    ``batch int`` column (empty batch dirs have no readable footer),
    ``partition_cols`` the hive sub-partitioning to preserve
    (``fpbucket``/``tbucket``), and ``fold`` an optional
    DataFrame -> DataFrame aggregation applied to the young rows.

    Young/level state is evaluated PER TABLE (a crash between two
    tables' swaps leaves them at different levels; the retry folds
    whichever tables still hold young batches), and each table's swap
    runs through :func:`staged_fold_swap`, so a crash at ANY point
    either rolls back or rolls forward on retry - never loses a level.

    Returns ``"noop"`` (no table had young batches - nothing written),
    ``"tiered"`` (folded into new level(s)), or ``"full_needed"``
    (some table already carries ``max_levels`` levels: the caller
    should run its FULL ``compact()`` to merge the levels - the
    periodic major compaction that bounds read-side file counts; with
    cadence C and L levels, only every L-th compaction pays the
    O(history) cost).

    Same non-atomicity caveat as the full swap: run between batches,
    never concurrently with readers."""
    from pyspark.sql import functions as F

    excl = None if exclude_batch is None else int(exclude_batch)
    states: list[tuple[list[int], list[int], bool]] = []
    for name, _schema, _pcols, _fold in tables:
        tpath = f"{path}/{name}"
        recover_fold_swap(spark, tpath)
        ids = list_batch_ids(spark, tpath)
        youngs = [i for i in ids if i >= 0 and i != excl]
        levels = [i for i in ids if i < 0]
        # record the excluded batch's presence NOW (one listing per
        # table) instead of re-globbing at swap time
        states.append((youngs, levels, excl is not None and excl in ids))
    if any(len(levels) >= int(max_levels) for _, levels, _ in states):
        return "full_needed"
    if all(not youngs for youngs, _, _ in states):
        return "noop"
    for (name, schema, partition_cols, fold), (
        youngs, levels, excl_present
    ) in zip(tables, states):
        if not youngs:
            continue
        tpath = f"{path}/{name}"
        new_level = min(levels, default=0) - 1
        young_df = (
            spark.read.schema(schema).parquet(tpath)
            .filter(F.col("batch").isin([int(i) for i in youngs]))
            .drop("batch")
        )
        if fold is not None:
            young_df = fold(young_df)

        def _write(dest: str, df: DataFrame = young_df,
                   pcols=tuple(partition_cols or ())) -> None:
            w = df.write.mode("overwrite")
            if pcols:
                w = w.partitionBy(*pcols)
            w.parquet(dest)

        keeps = list(levels)
        if excl_present:
            keeps.append(excl)
        staged_fold_swap(spark, tpath, new_level, _write, keeps)
    return "tiered"
