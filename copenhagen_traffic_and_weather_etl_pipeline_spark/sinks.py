"""Table sinks (SURVEY.md §2.1 S5/S6/S7).

The reference appends one-row CSV load jobs to BigQuery
(deployment_function.py:182-196, ``if_exists='append'``) and refreshes
``latest_joined_data`` with WRITE_TRUNCATE (README.md:84). Here:
Parquet tables, append vs overwrite mode, date-partitioned for scale
(partition pruning makes the latest-snapshot query touch one partition
instead of the whole history).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


class NotNullViolation(ValueError):
    """Raised by :func:`append_table` in ``reject`` mode when the batch
    carries a NULL in a declared NOT NULL column — the Spark-side
    equivalent of a BigQuery load job failing the table's NOT NULL
    schema (bigquery_table_creation_queries.sql:2-19,23-37)."""


def _not_null_violation_cond(cols: list[str]):
    from functools import reduce

    from pyspark.sql import functions as F

    return reduce(lambda a, b: a | b, (F.col(c).isNull() for c in cols))


def append_table(
    df: DataFrame,
    path: str,
    partition_by: list[str] | None = None,
    format: str = "parquet",
    not_null: list[str] | None = None,
    on_violation: str = "reject",
    quarantine_path: str | None = None,
) -> int | None:
    """S5: append-mode fact-table sink (deployment_function.py:188).

    Unlike the reference's 40 one-row load jobs per tick, a single
    distributed write lands the whole batch; ``partition_by=['date']``
    keeps per-day files together so time filters prune. ``format``
    takes any Spark-built-in table format (parquet default; orc keeps
    identical pruning/pushdown behavior, json/csv for interchange —
    columnar stats-based skipping is lost outside parquet/orc).

    BigQuery parity passthrough: the reference's actual sink is a
    BigQuery load job (``pandas_gbq.to_gbq``,
    deployment_function.py:182-196). ``format="bigquery"`` passes
    straight through to the open-source Spark BigQuery connector —
    ``path`` becomes the ``dataset.table`` save target (connector
    options such as ``writeMethod``/``temporaryGcsBucket`` are session
    conf, set before calling). The NOT NULL guard below runs
    ENGINE-SIDE first, so reject/quarantine semantics are identical
    across formats: a violating batch raises (or dead-letters to
    ``<dataset.table>_quarantine``) before anything reaches the
    connector. The connector jar is not bundled here; without it Spark
    raises its DATA_SOURCE_NOT_FOUND error at the write — the contract
    up to that boundary is pinned in tests/test_plans_sinks_functions.py.

    NOT NULL enforcement (bigquery_table_creation_queries.sql:2-19):
    the reference's BigQuery DDL makes every ingested column NOT NULL
    and the load job HARD-FAILS on violation; Spark's parquet catalog
    treats declared nullability as advisory, so the guard lives at the
    write: pass ``not_null=[cols...]`` and either

    - ``on_violation="reject"`` (default): probe for one violating row
      (``LIMIT 1`` — early-out scan, no full count) and raise
      :class:`NotNullViolation` BEFORE any file lands, keeping the
      append all-or-nothing like a BigQuery load job; or
    - ``on_violation="quarantine"``: split the batch — clean rows
      append to ``path``, violating rows land in ``quarantine_path``
      (default ``<path>_quarantine``) with the same layout — the
      dead-letter pattern for pipelines that must not drop ticks. The
      QUARANTINE write lands FIRST, deliberately: the two appends are
      not atomic together, so whichever commits before a failure gets
      duplicated when the caller (e.g. foreachBatch) retries the whole
      batch. Under commit-on-job-success semantics (FileOutputCommitter
      algorithm v1 — Spark's default here) a failed append commits
      nothing visible, so quarantine-first bounds the retry damage to
      duplicate DEAD-LETTER rows — benign for a triage table nothing
      downstream aggregates — whereas clean-first would silently
      duplicate FACT rows that the snapshot join and every downstream
      aggregate read. Committer v2 / direct cloud committers publish
      per-TASK, so a mid-job failure can leave partial files on EITHER
      table and the bound weakens to "partial rows only on the table
      whose write failed" — quarantine-first is still the better order
      (the fact append runs last, so fact partials require the fact
      write itself to fail), but exactly-once it is not. True
      exactly-once across retries of a two-table append needs a
      transactional table format (Delta/Iceberg), which this
      parquet-dir sink intentionally doesn't assume.

    Returns the quarantined-row count (0 under a passing reject), or
    None when no ``not_null`` check was requested. The batch is
    persisted for the duration of the check so the probe, the split,
    and the writes all see ONE materialization of the input — without
    it a non-deterministic plan (rand/sample/re-read of a moving
    source) could pass the reject probe yet land a NULL, or
    drop/duplicate rows between the two quarantine splits. Scale note:
    the check costs one extra pass over the batch (filter scan + write,
    or two filtered writes for quarantine) plus the cache footprint of
    the batch — batches here are per-tick appends, orders of magnitude
    smaller than the table; never run it over the accumulated table
    itself (that's ``dq_expectations``' job as a publish gate).
    """
    _guard_not_versioned_root(path, "append_table")
    persisted = False
    try:
        if not_null:
            if on_violation not in ("reject", "quarantine"):
                raise ValueError(f"on_violation must be reject|quarantine, got {on_violation!r}")
            missing = [c for c in not_null if c not in df.columns]
            if missing:
                raise ValueError(f"not_null columns absent from batch: {missing}")
            df = df.persist()
            persisted = True
            viol = _not_null_violation_cond(not_null)
            if on_violation == "reject":
                sample = df.where(viol).limit(1).collect()
                if sample:
                    raise NotNullViolation(
                        f"append to {path} rejected: NULL in declared NOT NULL "
                        f"column(s) {not_null}; first violating row: {sample[0].asDict()}"
                    )
                quarantined = 0
                clean = df
                bad = None
            else:
                bad = df.where(viol)
                quarantined = bad.count()
                clean = df.where(~viol)
        else:
            quarantined = None
            clean = df
            bad = None
        if bad is not None and quarantined:
            qpath = quarantine_path or path.rstrip("/") + "_quarantine"
            qwriter = bad.write.mode("append").format(format)
            if partition_by:
                qwriter = qwriter.partitionBy(*partition_by)
            qwriter.save(qpath)
        writer = clean.write.mode("append").format(format)
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(path)
        return quarantined
    finally:
        if persisted:
            df.unpersist()


def overwrite_table(df: DataFrame, path: str, format: str = "parquet") -> None:
    """S6: WRITE_TRUNCATE-style snapshot refresh (README.md:84).

    Spark's own overwrite deletes-then-writes, so a concurrent reader
    (or a crash) can observe a partial table — the same last-writer-wins
    semantics the reference accepts for ``latest_joined_data``
    (README.md:84). For reader-safe, crash-atomic refreshes use the
    version-pointer layout: :func:`overwrite_table_versioned` +
    :func:`read_table_versioned`."""
    _guard_not_versioned_root(path, "overwrite_table")
    df.write.mode("overwrite").format(format).save(path)


_CURRENT_POINTER = "_CURRENT"


def _guard_not_versioned_root(path: str, caller: str) -> None:
    """Refuse plain-layout writes into a version-pointer root: an
    append would land part files beside ``v_<n>``/``_CURRENT`` (a mixed
    layout the retention sweep never cleans and plain readers choke
    on), and a plain overwrite would silently delete the pointer and
    every version out from under :func:`read_table_versioned` readers.
    The mirror image of :func:`overwrite_table_versioned`'s migration
    guard. ``path`` may be a non-filesystem target (e.g. a BigQuery
    ``dataset.table``) — those never have a pointer file and pass."""
    from pathlib import Path

    if (Path(path) / _CURRENT_POINTER).exists():
        raise ValueError(
            f"{caller} refused: {path} is a version-pointer table "
            "(_CURRENT present). Publish through "
            "overwrite_table_versioned instead, or use a different path."
        )


def overwrite_table_versioned(
    df: DataFrame, path: str, format: str = "parquet", keep: int = 1
) -> str:
    """Reader-safe, crash-atomic snapshot refresh via a version-pointer
    layout — MVCC-in-a-directory, the trick every ACID table format
    (Iceberg's metadata pointer, Delta's _last_checkpoint) builds on,
    reduced to its single-table essence with no format dependency.

    Layout: ``path/`` holds immutable version dirs ``v_<n>/`` plus a
    ``_CURRENT`` pointer file whose FIRST line names the live one (the
    following lines are the retained publish history, newest first —
    the pointer file doubles as the publication log, so "previously
    published" never has to be guessed from sibling dir names, which
    may be crash garbage). A refresh

    1. writes the new snapshot to the next ``v_<n>`` (invisible to
       readers — nothing points at it), then fsyncs every file in it
       plus the dir tree — Spark's local-FS committer does NOT fsync
       data blocks, so without this a power loss could persist a
       durable pointer naming a version whose data never reached disk,
    2. publishes by writing ``_CURRENT.tmp.<uuid>``, fsyncing it, and
       ``os.replace``-ing it over ``_CURRENT``, then fsyncing the
       directory — the rename is atomic on POSIX and the fsync pair
       makes the POINTER durable and tear-free (every reader sees
       either the old pointer or the new one, never a missing or
       half-written table; contrast :func:`_swap_in`'s brief
       table-absent window between its two directory renames). The
       step-1 data fsync holds for local filesystems only: on a real
       cluster writing HDFS/object storage, data durability is the
       store's contract (HDFS hflush/hsync on commit, object-store
       PUT-is-durable), not this function's,
    3. sweeps every version dir not on the new history: the current
       one plus the ``keep`` most recently PUBLISHED predecessors
       survive, so a reader that resolved the pointer up to ``keep``
       refreshes ago can still finish its scan. Crash orphans (dirs
       that were written but never pointed) are always swept — they
       are not on the history. Size ``keep`` to the longest scan a
       reader may run measured in refresh intervals (a per-micro-batch
       streaming refresh with long dashboard scans wants more than the
       default 1).

    A crash before step 2 leaves the old version live and an orphaned
    unpointed dir (swept by the next refresh); a crash after step 2 is
    a completed refresh. Single-writer protocol, like the reference's
    one scheduled refresh (README.md:84) — concurrent refreshers would
    race the version numbering and need a lock or a conditional-PUT
    pointer flip. Returns the published version dir path.

    Migration guard: a pointer-less ``path`` already holding plain
    table files is REFUSED — writing ``v_0`` beside root-level part
    files would leave a mixed layout where path-based readers see
    conflicting directory structures and the stale root files are
    never swept. Migrate explicitly: read the plain table, publish it
    through this function at a fresh path (or clear the old files),
    then retire the plain location.

    Scale note: on object stores without atomic rename, step 2 becomes
    a conditional PUT (S3 If-None-Match / GCS generation preconditions)
    — same protocol, different primitive; at that point you are
    reimplementing Iceberg's commit and should just use it. The
    pointer file read adds one metadata round-trip per query — noise
    against any real scan.
    """
    import errno
    import os
    import shutil
    import uuid
    from pathlib import Path

    root = Path(path)
    root.mkdir(parents=True, exist_ok=True)
    pointer = root / _CURRENT_POINTER
    if not pointer.exists():
        foreign = [
            e.name
            for e in root.iterdir()
            if not (e.is_dir() and e.name.startswith("v_"))
            and not e.name.startswith(_CURRENT_POINTER)
        ]
        if foreign:
            raise ValueError(
                f"refusing to version-initialize {path}: it already holds "
                f"non-versioned entries {sorted(foreign)[:5]} — a plain "
                "table. Publish to a fresh path or clear it first (see "
                "overwrite_table_versioned docstring, migration guard)."
            )
    history = pointer.read_text().splitlines() if pointer.exists() else []
    versions = sorted(
        (d for d in root.iterdir() if d.is_dir() and d.name.startswith("v_")),
        key=lambda d: int(d.name[2:]),
    )
    nxt = root / f"v_{int(versions[-1].name[2:]) + 1 if versions else 0}"

    df.write.mode("overwrite").format(format).save(str(nxt))

    # Data-before-pointer durability (docstring step 1): local-FS writes
    # are not fsynced by Spark's committer; flush the version's blocks
    # and dir entries before anything durable points at them. Cheap
    # relative to the snapshot write itself.
    if nxt.exists():
        for entry in [nxt, *nxt.rglob("*")]:
            # Tolerate entries VANISHING between rglob and open —
            # Spark's committer leaves transient .crc/_temporary
            # droppings it may still be clearing; a gone-again temp
            # file must not abort a refresh whose snapshot data is
            # already written. Only ENOENT/ESTALE qualify: a broader
            # OSError catch (EMFILE/EACCES/EIO) could skip fsyncing a
            # REAL snapshot parquet and publish the pointer over
            # unflushed data, silently voiding the data-before-pointer
            # guarantee. Skip non-regular, non-directory entries
            # (sockets/fifos can't be fsynced).
            try:
                if not (entry.is_file() or entry.is_dir()):
                    continue
                fd = os.open(entry, os.O_RDONLY)
            except OSError as e:
                if e.errno in (errno.ENOENT, errno.ESTALE):
                    continue
                raise
            try:
                os.fsync(fd)
            finally:
                os.close(fd)

    new_history = [nxt.name] + [v for v in history if v != nxt.name][: max(keep, 0)]
    tmp = root / f"{_CURRENT_POINTER}.tmp.{uuid.uuid4().hex[:8]}"
    with open(tmp, "w") as f:
        f.write("\n".join(new_history))
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, pointer)
    dirfd = os.open(root, os.O_RDONLY)
    try:
        os.fsync(dirfd)
    finally:
        os.close(dirfd)

    live = set(new_history)
    for d in versions:
        if d.name not in live:
            shutil.rmtree(d)
    for stale in root.glob(f"{_CURRENT_POINTER}.tmp.*"):
        stale.unlink(missing_ok=True)
    return str(nxt)


def read_table_versioned(
    spark: SparkSession, path: str, format: str = "parquet"
) -> DataFrame:
    """Resolve a version-pointer table (see
    :func:`overwrite_table_versioned`) and read its live version (the
    pointer's first line; the rest is retained history). The pointer
    resolution pins THIS query to one immutable version dir — a
    refresh committing mid-scan is invisible (snapshot isolation for
    a single reader), because published version dirs are never
    mutated, only superseded and eventually swept (after ``keep``
    further refreshes)."""
    from pathlib import Path

    pointer = Path(path) / _CURRENT_POINTER
    version = pointer.read_text().splitlines()[0].strip()
    return spark.read.format(format).load(str(Path(path) / version))


def write_bucketed(
    df: DataFrame,
    table_name: str,
    path: str,
    n_buckets: int,
    key_cols: list[str],
    sort_cols: list[str] | None = None,
) -> None:
    """Bucketed external table: rows are hash-clustered on ``key_cols``
    into ``n_buckets`` files (optionally sorted within each bucket).

    This is the co-located-join lever at 100 TB: two tables bucketed the
    same way join with ZERO exchange — Catalyst sees the matching output
    partitioning and drops the shuffle on both sides (proved in
    tests/test_plan_quality.py). Bucket count should be sized so one
    bucket ≈ one task's worth of data at the target scale.
    """
    writer = df.write.bucketBy(n_buckets, *key_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.option("path", path).mode("overwrite").format("parquet").saveAsTable(
        table_name
    )


def compact_table(
    spark: SparkSession,
    path: str,
    target_files: int,
    sort_col: str | None = None,
) -> int:
    """Small-file compaction: rewrite a parquet table into
    ``target_files`` files, optionally range-sorted on ``sort_col``.

    Hourly appends (the reference lands a batch every tick) accumulate
    files far smaller than one HDFS/S3 block; at 100 TB the resulting
    per-file open/seek overhead dominates scan time. Compaction is the
    standing maintenance job: ``repartitionByRange(sort_col)`` (or a
    plain round-robin ``repartition``) re-clusters rows so parquet
    row-group min/max stats become disjoint and time filters skip whole
    files. Writes to a temp dir first, then swaps via two directory
    renames (old aside → new in → delete old) — readers never see a
    half-WRITTEN table, and a crash mid-swap leaves either the old or
    the new table intact on disk (never data loss — the rmtree-then-move
    ordering this replaces could lose the table for the whole deletion).
    Two stated limits of the rename swap: (1) between the two renames
    the table is briefly ABSENT at ``path`` — a concurrent reader can
    get a transient FileNotFound (see :func:`_swap_in`); (2) a crash
    there parks the table at an ``_old_*`` sibling. Every compaction
    call therefore starts with :func:`_sweep_orphans`, which restores a
    parked table and clears leaked staging dirs — recovery is
    automatic, not manual. On object stores without atomic rename, use
    a catalog/manifest-swap format (Iceberg/Delta) instead. Returns the
    number of data files written.

    On a version-pointer table (see :func:`overwrite_table_versioned`)
    both stated limits disappear: the compacted rewrite lands as the
    next immutable ``v_<n>`` and publishes via the atomic pointer flip,
    so readers never see an absent table and a crash at any point
    leaves the old version live — compaction becomes just another
    snapshot refresh. Detection is automatic (the ``_CURRENT`` file).
    """
    df = _read_for_maintenance(spark, path)
    if sort_col is not None:
        out = df.repartitionByRange(target_files, sort_col).sortWithinPartitions(
            sort_col
        )
    else:
        out = df.repartition(target_files)
    return _publish_compacted(out, path, "compact")


def _is_versioned(path: str) -> bool:
    from pathlib import Path

    return (Path(path) / _CURRENT_POINTER).exists()


def _read_for_maintenance(spark: SparkSession, path: str) -> DataFrame:
    """Source resolution shared by the compaction jobs: a version-pointer
    table reads its live immutable version (no orphan sweep needed —
    :func:`overwrite_table_versioned` sweeps its own); a plain directory
    first runs :func:`_sweep_orphans` crash recovery, then reads in
    place."""
    if _is_versioned(path):
        return read_table_versioned(spark, path)
    _sweep_orphans(path)
    return spark.read.parquet(path)


def _publish_compacted(out: DataFrame, path: str, tag: str) -> int:
    """Publish a compacted rewrite. Version-pointer table: write the
    next immutable ``v_<n>`` and flip the pointer (crash-atomic,
    reader-safe — the lazy ``out`` plan scans the OLD version dir while
    writing the new one, so read and write never touch the same files),
    preserving the retention depth the table's owner established (the
    pointer's history length — a maintenance job must not shorten the
    window long readers were promised). Plain directory: staged write +
    two-rename :func:`_swap_in`. Returns the number of parquet files
    written."""
    from pathlib import Path

    if _is_versioned(path):
        history = (Path(path) / _CURRENT_POINTER).read_text().splitlines()
        published = overwrite_table_versioned(
            out, path, keep=max(len(history) - 1, 1)
        )
        return _count_parquet_files(published)
    tmp = _staging_sibling(path, tag)
    out.write.mode("overwrite").parquet(tmp)
    return _swap_in(path, tmp)


def _count_parquet_files(path: str) -> int:
    from pathlib import Path

    return sum(1 for p in Path(path).iterdir() if p.name.endswith(".parquet"))


def _staging_sibling(path: str, tag: str) -> str:
    import uuid
    from pathlib import Path

    return str(
        Path(path).with_name(Path(path).name + f"_{tag}_{uuid.uuid4().hex[:8]}")
    )


def _swap_in(path: str, tmp: str) -> int:
    """Replace the table dir at ``path`` with the staged dir ``tmp``
    via two same-parent renames, then delete the displaced old dir.
    Same-parent keeps both renames on one filesystem (true directory
    renames, not copies). Returns the new dir's parquet file count.

    Consistency window, stated precisely: between the two renames
    nothing exists at ``path`` — a concurrent reader listing the table
    at that instant gets FileNotFound (a transient it must retry), and
    a crash there leaves the table parked at the ``_old_*`` sibling
    until the next :func:`compact_table` call's :func:`_sweep_orphans`
    restores it. What the two-rename ordering guarantees is NO DATA
    LOSS at any crash point (the rmtree-then-move it replaced could
    lose the table for the whole deletion) — not reader-invisible
    atomicity, which on a plain filesystem needs a version-pointer
    indirection or an ACID table format."""
    import shutil

    old = _staging_sibling(path, "old")
    shutil.move(path, old)
    shutil.move(tmp, path)
    shutil.rmtree(old)
    return _count_parquet_files(path)


def _sweep_orphans(path: str) -> None:
    """Crash recovery for :func:`_swap_in`'s leftovers, run at the
    start of every compaction: if ``path`` is missing but a displaced
    ``_old_*`` sibling exists (crash between the two renames), rename
    the old table back into place — the interrupted compaction is
    simply redone; then delete any remaining ``_old_*`` /
    ``_compact_*`` / ``_zorder_*`` staging siblings (an ``_old_*``
    with ``path`` present means the crash hit after the new table was
    already in; a staging dir with ``path`` present was never swapped
    in — both are safe to drop)."""
    import shutil
    from pathlib import Path

    p = Path(path)
    prefixes = tuple(p.name + f"_{tag}_" for tag in ("old", "compact", "zorder"))
    siblings = sorted(
        s for s in p.parent.glob(p.name + "_*") if s.name.startswith(prefixes)
    )
    if not p.exists():
        olds = [s for s in siblings if s.name.startswith(p.name + "_old_")]
        if olds:
            restored = olds.pop()
            shutil.move(str(restored), path)
            siblings = [s for s in siblings if s != restored]
    for s in siblings:
        shutil.rmtree(s)


def zorder_key(c1, c2, bits: int = 16):
    """Morton (Z-order) interleave of two bucketed integer columns —
    the multi-dimensional clustering key Spark has no built-in for.

    Range-sorting on ONE column makes that column's row-group min/max
    disjoint but leaves every other column's stats spanning the full
    domain (no skipping). Interleaving the bits of two columns gives a
    single sort key whose locality is shared: a range of Z values maps
    to a bounded rectangle in (c1, c2) space, so BOTH columns' min/max
    per file shrink to ~sqrt(files) of the domain — predicates on either
    column skip files. Inputs must already be integers in
    [0, 2**bits); pure shift/or/and expressions, fully codegen'd.

    Bit convention: ``c1`` occupies the EVEN bits, ``c2`` the odd bits —
    the same layout as ``workload.layout_queries._morton_expr``, so
    z-range predicates and bucket stats computed by
    ``zorder_cluster_key`` apply directly to files written through
    ``compact_table_zorder`` (pinned by
    tests/test_layout_queries.py::test_zorder_key_matches_layout_query_convention).

    BREAKING LAYOUT MIGRATION: this convention is the reverse of the
    pre-unification one (``c1`` on odd bits). A table compacted with
    ``compact_table_zorder`` under the old convention silently
    mis-sorts against new z-range predicates and ``zorder_decode``
    output — re-run ``compact_table_zorder`` (re-OPTIMIZE) on any such
    table before relying on z-key file skipping.
    """
    from pyspark.sql import functions as F

    key = F.lit(0).cast("long")
    for i in range(bits):
        b1 = F.shiftright(c1.cast("long"), i).bitwiseAND(F.lit(1))
        b2 = F.shiftright(c2.cast("long"), i).bitwiseAND(F.lit(1))
        key = key.bitwiseOR(F.shiftleft(b1, 2 * i)).bitwiseOR(
            F.shiftleft(b2, 2 * i + 1)
        )
    return key


def zorder_decode(zkey, bits: int = 16):
    """Inverse of :func:`zorder_key`: split a Morton key back into its
    two component columns ``(c1, c2)``.

    Needed when debugging file layout (which (c1, c2) rectangle does
    this file's [min_z, max_z] range cover?) and when building z-range
    pushdown predicates for a rectangle query. Pure shift/or/and
    expressions like the encoder; ``zorder_decode(zorder_key(a, b))``
    is the identity for inputs in [0, 2**bits) — property-tested with
    hypothesis in tests/test_layout_queries.py.
    """
    from pyspark.sql import functions as F

    c1 = F.lit(0).cast("long")
    c2 = F.lit(0).cast("long")
    for i in range(bits):
        b1 = F.shiftright(zkey.cast("long"), 2 * i).bitwiseAND(F.lit(1))
        b2 = F.shiftright(zkey.cast("long"), 2 * i + 1).bitwiseAND(F.lit(1))
        c1 = c1.bitwiseOR(F.shiftleft(b1, i))
        c2 = c2.bitwiseOR(F.shiftleft(b2, i))
    return c1, c2


def compact_table_zorder(
    spark: SparkSession,
    path: str,
    target_files: int,
    col1: str,
    col2: str,
    bits: int = 16,
) -> int:
    """``compact_table`` variant clustered on the Z-order key of two
    columns: same publish protocol (version-pointer flip on a versioned
    table, staged write + rename swap with :func:`_sweep_orphans` crash
    recovery on a plain directory), but files become rectangles in
    (col1, col2) space instead of stripes in one dimension."""
    from pyspark.sql import functions as F

    df = _read_for_maintenance(spark, path)
    zk = zorder_key(F.col(col1), F.col(col2), bits).alias("__zk")
    out = (
        df.withColumn("__zk", zk)
        .repartitionByRange(target_files, "__zk")
        .sortWithinPartitions("__zk")
        .drop("__zk")
    )
    return _publish_compacted(out, path, "zorder")


def read_table_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Read a parquet table whose schema evolved across appends (new
    columns added by later ticks — the reference's upstream APIs add
    fields without notice; TomTom's ``@version`` bumps are the live
    example).

    ``mergeSchema=true`` unions the footers of every file: rows written
    before a column existed surface it as NULL, so downstream queries
    never break on mixed-vintage partitions. Scale note: footer merging
    reads one footer per file (driver-side listing + distributed footer
    reads) — at 100 TB keep it off (Spark's default) for steady-state
    scans and pin the evolved schema explicitly via
    ``spark.read.schema(...)`` once the evolution is known; this helper
    is for the transition window and ad-hoc exploration.
    """
    return spark.read.option("mergeSchema", "true").parquet(path)


def create_table_ddl(spark: SparkSession, name: str, schema, location: str) -> None:
    """S7: declarative table creation mirroring
    bigquery_table_creation_queries.sql. NOT NULL is advisory in Spark's
    parquet catalog; enforcement lives at the write instead —
    :func:`append_table`'s ``not_null`` reject/quarantine modes, which
    the streaming ingestion path passes for every schema-declared
    non-nullable column."""
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields)
    spark.sql(
        f"CREATE TABLE IF NOT EXISTS {name} ({cols}) USING parquet LOCATION '{location}'"
    )
