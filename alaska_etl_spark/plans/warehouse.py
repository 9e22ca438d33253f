"""Warehouse load protocol: staging overwrite → audit-timestamped,
idempotent append (SURVEY §2.2 K2/K4/K5, §7.1 step 5).

The reference's protocol is: truncate-load a ``*_staging`` BigQuery
table, then ``INSERT INTO main SELECT *, CURRENT_TIMESTAMP() AS
date_added_utc FROM main_staging``, creating main on NotFound (reference
airflow/dags/utils/utils.py:44-66). That protocol double-inserts on
retry (the reference actually loads staging twice in one task,
nws_dag.py:175+187 — a latent duplication bug tolerated by dedup-on-read).

We keep the two-phase shape (staging is the retry/inspection point) and
make the append *idempotent*: rows are keyed by a content hash
(``sha2`` over the key columns — the reference's vestigial ``hash_id``
column, 2_nws_update.ipynb:1114, attempted exactly this) and
anti-joined against the existing main table before appending.

Scale: main tables are written partitioned (by ``utc_date`` for the
weather star) so the anti-join's main-side scan prunes to the partitions
the staging batch can touch — the incremental batch is small, so Spark
broadcasts the *staging* side of the anti-join; main is never shuffled.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

AUDIT_COL = "date_added_utc"


class SchemaViolation(ValueError):
    """Raised by :func:`assert_schema` with per-column null counts."""


def assert_schema(df: DataFrame, schema, *, sample_action: bool = True) -> None:
    """K7 made pre-flight: the reference parsed BigQuery's 'Required
    column value for column index N' load error and rewrote it with the
    column *name* (reference nws_dag.py:174-185). We check non-nullable
    columns BEFORE the write — one aggregate pass — and raise with every
    offending column and its null count at once, instead of one opaque
    index per failed load attempt.

    Also verifies every schema column exists (missing columns are a
    plan-time error with the full missing list).
    """
    missing = [f.name for f in schema.fields if f.name not in df.columns and f.name != AUDIT_COL]
    if missing:
        raise SchemaViolation(f"missing columns: {missing}")
    required = [f.name for f in schema.fields if not f.nullable and f.name in df.columns]
    if not required or not sample_action:
        return
    counts = df.agg(
        *[F.sum(F.col(c).isNull().cast("long")).alias(c) for c in required]
    ).collect()[0]
    bad = {c: counts[c] for c in required if counts[c]}
    if bad:
        raise SchemaViolation(f"nulls in REQUIRED columns: {bad}")


def row_hash(df: DataFrame, key_cols: list[str]) -> DataFrame:
    """Stable content hash over key columns (NULL-safe, \\x1f-separated)."""
    return df.withColumn(
        "_row_hash",
        F.sha2(
            F.concat_ws("\x1f", *[F.coalesce(F.col(c).cast("string"), F.lit("\x00")) for c in key_cols]),
            256,
        ),
    )


#: formats addressed by filesystem path (local, gs://, s3a://, hdfs://);
#: everything else is a named-table connector.
PATH_FORMATS = ("parquet", "orc", "csv", "json")


def fs_and_path(spark: SparkSession, path: str):
    """(Hadoop FileSystem, Path) for ``path`` — any scheme Spark reads
    (file://, hdfs://, gs://, s3a://), unlike ``os.path``."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs, jpath


def data_bytes(spark: SparkSession, path: str) -> int:
    """Total data-file bytes under ``path`` (hidden ``_``/``.`` files
    excluded) via the Hadoop FileSystem API."""
    fs, jpath = fs_and_path(spark, path)
    total = 0
    it = fs.listFiles(jpath, True)
    while it.hasNext():
        st = it.next()
        name = st.getPath().getName()
        if not name.startswith(("_", ".")):
            total += st.getLen()
    return total


def swap_in(spark: SparkSession, tmp: str, live: str) -> None:
    """Atomically-enough replace ``live`` with ``tmp``: rename live
    aside, rename tmp in, drop the old copy. Readers never see a
    half-written directory; a crash between the renames leaves the
    ``__old`` copy to roll back from."""
    fs, live_p = fs_and_path(spark, live)
    _, tmp_p = fs_and_path(spark, tmp)
    old_p = fs_and_path(spark, live + "__old")[1]
    if fs.exists(old_p):
        fs.delete(old_p, True)
    if not fs.rename(live_p, old_p):
        raise IOError(f"could not move {live} aside")
    if not fs.rename(tmp_p, live_p):
        fs.rename(old_p, live_p)  # roll back
        raise IOError(f"could not move {tmp} into place")
    fs.delete(old_p, True)


def sink_spec(fmt: str, root: str, table: str, options: dict[str, str] | None = None) -> dict:
    """Resolve (format, root, table) to a concrete read/write target —
    the ONE place that knows how each backend is addressed, pure and
    unit-testable without the connector jars on the classpath.

    - path formats: ``root`` is a directory URI (``/data/wh``,
      ``gs://bucket/wh``) and the target is ``root/table``;
    - ``bigquery``: ``root`` is ``<project>.<dataset>`` and the target
      is the fully-qualified table name passed via the spark-bigquery
      connector's ``table`` option (reference loads the same tables via
      the BigQuery client, uscrn_dag.py:244-261, nws_dag.py:160-188).
      ``writeMethod`` defaults to ``direct`` (Storage Write API — no
      temporaryGcsBucket needed; set ``writeMethod=indirect`` +
      ``temporaryGcsBucket`` to stage through GCS instead).
    """
    opts = dict(options or {})
    if fmt in PATH_FORMATS:
        return {"format": fmt, "kind": "path", "target": os.path.join(root, table), "options": opts}
    if fmt == "bigquery":
        opts.setdefault("writeMethod", "direct")
        return {"format": fmt, "kind": "table", "target": f"{root}.{table}", "options": opts}
    raise ValueError(f"unknown warehouse format {fmt!r} (path formats: {PATH_FORMATS}, or 'bigquery')")


class Warehouse:
    """Format-pluggable warehouse with the staging→main protocol.

    ``fmt`` picks the sink/source backend: any path format (parquet is
    the default; the protocol tests also run against orc to prove the
    seam carries) or ``bigquery`` for the reference's actual sink via
    the spark-bigquery connector. Protocol semantics (staging
    truncate-load, audit append, hash-anti-join idempotence) are
    identical across backends — the swap is configuration, not code
    (SURVEY §7.1 step 8).
    """

    def __init__(
        self,
        spark: SparkSession,
        root: str,
        *,
        fmt: str = "parquet",
        options: dict[str, str] | None = None,
    ):
        self.spark = spark
        self.root = root
        self.fmt = fmt
        self.options = dict(options or {})
        sink_spec(fmt, root, "_probe_", self.options)  # validate fmt eagerly

    def _spec(self, table: str) -> dict:
        return sink_spec(self.fmt, self.root, table, self.options)

    def _path(self, table: str) -> str:
        return self._spec(table)["target"]

    def _read_spec(self, spec: dict) -> DataFrame:
        reader = self.spark.read.format(spec["format"]).options(**spec["options"])
        if spec["kind"] == "path":
            return reader.load(spec["target"])
        return reader.option("table", spec["target"]).load()

    def _write_spec(self, df: DataFrame, spec: dict, mode: str, partition_col: str | None = None):
        writer = df.write.format(spec["format"]).mode(mode).options(**spec["options"])
        if partition_col:
            writer = writer.partitionBy(partition_col)
        if spec["kind"] == "path":
            writer.save(spec["target"])
        else:
            writer.option("table", spec["target"]).save()

    def table_exists(self, table: str) -> bool:
        try:
            self._read_spec(self._spec(table)).schema
            return True
        except Exception:
            return False

    def probe_exists(self, table: str) -> bool:
        """Existence probe that DISTINGUISHES missing from transient
        error — unlike ``table_exists``'s broad try/except, a
        filesystem or connector failure RAISES here instead of reading
        as "absent". Streaming sinks must use this probe: an "absent"
        verdict resets their ledgers / seen-sets to empty, and only a
        genuinely-missing table may do that — a transient failure
        misread as absent would re-admit up to a full quota per domain
        (the silent-reset bug the explicit probe exists to prevent).

        Path sinks ask the Hadoop FileSystem directly (works for any
        scheme Spark reads: file://, hdfs://, gs://). Table sinks
        (``kind == "table"``, e.g. bigquery) attempt a schema read and
        re-raise unless the connector's error clearly says not-found —
        the conservative direction: an unrecognized error fails the
        batch (replay-safe) rather than resetting state.
        """
        spec = self._spec(table)
        if spec["kind"] == "path":
            fs, p = fs_and_path(self.spark, spec["target"])
            return fs.exists(p)
        try:
            self._read_spec(spec).schema
            return True
        except Exception as e:  # connector-specific not-found detection
            msg = str(e).lower()
            if "not found" in msg or "notfound" in msg or "does not exist" in msg:
                return False
            raise

    def read(self, table: str, *, merge_schema: bool = False) -> DataFrame:
        """Read a table; ``merge_schema=True`` unions the schemas of
        every data file (additive evolution: a batch appended with a new
        nullable column widens the table — pre-evolution rows read the
        column as NULL). Off by default: schema union reads every file
        footer, which at 100 TB is a real listing cost — pay it on the
        evolved tables, not every scan (or re-register the widened
        schema in the catalog once and go back to single-footer reads).
        The reference's BigQuery tables did this with manual
        ALTER-style schema updates; parquet-on-path gets it from footer
        union."""
        spec = self._spec(table)
        if merge_schema and spec["format"] in ("parquet", "orc"):
            spec = dict(spec, options=dict(spec["options"], mergeSchema="true"))
        return self._read_spec(spec)

    # -- K2: staging truncate-load ---------------------------------------

    def write_staging(self, df: DataFrame, table: str) -> str:
        """Overwrite the staging area for ``table`` (reference
        WRITE_TRUNCATE, uscrn_dag.py:244-261)."""
        spec = self._spec(f"{table}_staging")
        self._write_spec(df, spec, "overwrite")
        return spec["target"]

    def read_staging(self, table: str) -> DataFrame:
        return self._read_spec(self._spec(f"{table}_staging"))

    # -- K4/K5: audit-timestamped append, create-if-missing --------------

    def append_main(
        self,
        table: str,
        *,
        key_cols: list[str],
        partition_col: str | None = None,
        staging_df: DataFrame | None = None,
        store_row_hash: bool = False,
        assume_new: bool = False,
    ) -> None:
        """staging → main with ``date_added_utc`` audit column and
        hash-anti-join idempotence (FIXTURES §5 invariant 5: re-running a
        load must not duplicate rows).

        ``store_row_hash=True`` persists the ``_row_hash`` key digest as
        a table column, so every LATER append's existing-side read is a
        column-pruned scan of a precomputed hash instead of
        re-evaluating sha2 over every landed row — the measured
        dominant per-batch term of a high-frequency idempotent sink
        once the main table is large (SCALE.md "Frontier per-batch scan
        cost": at 10⁷ rows the recompute is whole seconds per batch,
        growing linearly forever). Once a table carries the column it
        is maintained on every subsequent append regardless of the
        flag (schema consistency); tables created without it keep the
        original recompute path.

        ``assume_new=True`` (r12, the Bloom frontier's fast lane) skips
        the existing-side anti-join entirely — zero reads of the landed
        rows. CONTRACT: the caller must hold a proof that no staged key
        is already landed; the streaming sinks get one from a
        Bloom-negative membership test on a filter kept as a SUPERSET
        of the landed keys (operators/pruning.py sidecar invariant —
        no false negatives, superset maintained by writing the sidecar
        before the rows). Schema handling (hash column maintenance,
        audit column) is unchanged; only the row-grain idempotence scan
        is elided."""
        staged = staging_df if staging_df is not None else self.read_staging(table)
        staged = row_hash(staged, key_cols)

        # Empty batches are a no-op: a 0-row partitioned parquet write
        # produces no data files (an unreadable "table"), and appending
        # nothing needs no audit row. The main table appears on the
        # first non-empty load.
        if staged.isEmpty():
            return

        keep_hash = store_row_hash
        if self.table_exists(table):
            main = self.read(table)
            if "_row_hash" in main.columns:
                keep_hash = True  # never fork an existing table's schema
                existing = main.select("_row_hash")
            else:
                keep_hash = False
                existing = row_hash(main, key_cols).select("_row_hash")
            if not assume_new:
                # staging batch is the small side → broadcast it;
                # main-side scan reads only the hash column (pruned).
                staged = staged.join(existing, "_row_hash", "left_anti")

        if not keep_hash:
            staged = staged.drop("_row_hash")
        out = staged.withColumn(AUDIT_COL, F.current_timestamp())
        self._write_spec(out, self._spec(table), "append", partition_col=partition_col)

    def load(
        self,
        df: DataFrame,
        table: str,
        *,
        key_cols: list[str],
        partition_col: str | None = None,
        store_row_hash: bool = False,
        assume_new: bool = False,
    ) -> None:
        """Full protocol: staging overwrite then idempotent append."""
        self.write_staging(df, table)
        self.append_main(
            table,
            key_cols=key_cols,
            partition_col=partition_col,
            store_row_hash=store_row_hash,
            assume_new=assume_new,
        )

    # -- bucketed catalog tables (the co-located-join path, SURVEY §4) ---

    def save_bucketed(
        self,
        df: DataFrame,
        table: str,
        *,
        bucket_cols: list[str],
        n_buckets: int,
        sort_cols: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        """Write ``table`` bucketed (and optionally sorted) by the join
        key into the session catalog. Two tables bucketed the same way
        join with NO exchange on either side — the shuffle is paid once
        at write time instead of on every query, which is the right
        trade for the repeatedly-joined 100 TB facts (forecast ⋈ actual
        on (location, utc_datetime); embeddings ⋈ buckets on cell id).
        """
        if self.fmt not in PATH_FORMATS:
            raise ValueError(f"bucketed catalog tables need a path format, not {self.fmt!r}")
        writer = df.write.format(self.fmt).mode(mode).bucketBy(n_buckets, *bucket_cols)
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        writer.option("path", self._path(table)).saveAsTable(table)

    def read_table(self, table: str) -> DataFrame:
        """Read a catalog (bucketed) table — bucket metadata only
        survives through the catalog, not raw parquet paths."""
        return self.spark.table(table)

    # -- maintenance: compaction and key-merge ---------------------------

    def _fs_and_path(self, path: str):
        return fs_and_path(self.spark, path)

    def _data_bytes(self, path: str) -> int:
        return data_bytes(self.spark, path)

    def _swap_in(self, tmp: str, live: str) -> None:
        swap_in(self.spark, tmp, live)

    def compact(
        self,
        table: str,
        *,
        target_file_bytes: int = 128 * 1024 * 1024,
        partition_col: str | None = None,
    ) -> int:
        """Small-file compaction: rewrite ``table`` into
        ``ceil(data_bytes / target_file_bytes)`` write tasks and swap the
        directory in atomically. Returns the task count.

        The incremental append protocol necessarily accretes one file
        set per batch; at 100 TB the resulting tiny files dominate query
        cost (every file is an open + a footer read + a task). Sizing is
        measured from the filesystem, not guessed from row counts. For
        an unpartitioned table the rewrite is a ``coalesce`` — a narrow
        dependency, NO shuffle: tasks read neighboring input files and
        write merged ones. A partitioned table pays one hash exchange on
        ``partition_col`` so each partition's scattered batch files
        collapse into the few tasks that hold it, and the layout is
        preserved by writing ``partitionBy`` again.
        """
        if self.fmt not in PATH_FORMATS:
            raise ValueError(f"compaction needs a path format, not {self.fmt!r}")
        spec = self._spec(table)
        live = spec["target"]
        n_files = max(1, -(-self._data_bytes(live) // target_file_bytes))
        df = self._read_spec(spec)
        tmp_spec = self._spec(f"{table}__compact_tmp")
        if partition_col is not None:
            self._write_spec(
                df.repartition(n_files, partition_col), tmp_spec, "overwrite", partition_col
            )
        else:
            self._write_spec(df.coalesce(n_files), tmp_spec, "overwrite")
        self._swap_in(tmp_spec["target"], live)
        return n_files

    def merge_upsert(
        self,
        df: DataFrame,
        table: str,
        *,
        key_cols: list[str],
        partition_col: str | None = None,
    ) -> None:
        """Key-based merge (UPDATE existing keys, INSERT new ones) —
        the protocol step the reference never had (its append tolerates
        duplicates; dimension corrections need a true upsert).

        Scale shape: with ``partition_col`` the merge is PARTITION-
        SCOPED — survivors are computed only over the partitions present
        in the batch (partition-pruned scan), and the write uses dynamic
        partition overwrite so ONLY those partitions are replaced; the
        other 99.9% of a 100 TB table is never read or written. Without
        a partition column the whole table is rewritten through a temp
        directory + atomic swap (the honest no-table-format baseline —
        avoiding exactly this rewrite is why merge-on-read formats
        exist). The batch side is broadcast in the anti-join; existing
        rows keep their audit stamp, merged rows get a fresh one.
        """
        staged = row_hash(df, key_cols)
        incoming = staged.withColumn(AUDIT_COL, F.current_timestamp())
        if not self.table_exists(table):
            self._write_spec(
                incoming.drop("_row_hash"), self._spec(table), "append", partition_col
            )
            return
        main = row_hash(self.read(table), key_cols)
        if partition_col is not None:
            parts = [r[0] for r in df.select(partition_col).distinct().collect()]
            main = main.filter(F.col(partition_col).isin(parts))
        survivors = main.join(
            F.broadcast(incoming.select("_row_hash")), "_row_hash", "left_anti"
        )
        merged = survivors.unionByName(incoming).drop("_row_hash")
        spec = self._spec(table)
        if partition_col is not None:
            writer = (
                merged.write.format(spec["format"])
                .mode("overwrite")
                .options(**spec["options"])
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy(partition_col)
            )
            if spec["kind"] == "path":
                writer.save(spec["target"])
            else:
                writer.option("table", spec["target"]).save()
            return
        tmp_spec = self._spec(f"{table}__merge_tmp")
        self._write_spec(merged, tmp_spec, "overwrite")
        self._swap_in(tmp_spec["target"], spec["target"])

    # -- SCD2: dimension history ------------------------------------------

    def scd2_upsert(
        self,
        df: DataFrame,
        table: str,
        *,
        key_cols: list[str],
        attr_cols: list[str],
        as_of,
    ) -> None:
        """Apply a dimension batch as SCD Type-2 history (see
        :func:`scd2_merge`). Layout is partitioned by ``_scd_state``
        ('current' / 'closed'): the merge SCANS only the current
        partition (partition-pruned — at 100 TB of accumulated history
        the closed mass is never read), APPENDS closed versions into
        the closed partition, and dynamic-partition-overwrites only the
        current partition. Keys absent from the batch stay open
        (partial batches never close rows; deletes are an explicit op).

        Crash window: closed rows are appended before the current
        partition swaps, so a failure in between leaves a closed copy
        alongside a still-open version; rerunning the same batch
        converges (the open version closes again into a duplicate
        history row, the current set is correct). True atomicity across
        two partitions needs a table format with transactions — same
        stance as :meth:`merge_upsert`'s rewrite path.
        """
        spec = self._spec(table)
        incoming = (
            df.withColumn("effective_from", F.lit(as_of).cast("timestamp"))
            .withColumn("effective_to", F.lit(None).cast("timestamp"))
            .withColumn("is_current", F.lit(True))
        )
        if not self.table_exists(table):
            self._write_spec(
                incoming.withColumn("_scd_state", F.lit("current")),
                spec,
                "append",
                "_scd_state",
            )
            return
        current = self.read(table).filter(F.col("_scd_state") == "current").drop(
            "_scd_state"
        )
        new_current, closed = scd2_merge(
            current, df, key_cols=key_cols, attr_cols=attr_cols, as_of=as_of
        )
        self._write_spec(
            closed.withColumn("_scd_state", F.lit("closed")), spec, "append", "_scd_state"
        )
        writer = (
            new_current.withColumn("_scd_state", F.lit("current"))
            .write.format(spec["format"])
            .mode("overwrite")
            .options(**spec["options"])
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("_scd_state")
        )
        if spec["kind"] == "path":
            writer.save(spec["target"])
        else:
            writer.option("table", spec["target"]).save()

    def scd2_history(self, table: str) -> DataFrame:
        """Full version history, no state column."""
        return self.read(table).drop("_scd_state")


# ---------------------------------------------------------------------------
# SCD Type-2 dimension history
# ---------------------------------------------------------------------------

SCD2_COLS = ("effective_from", "effective_to", "is_current")


def scd2_merge(
    current: DataFrame,
    batch: DataFrame,
    *,
    key_cols: list[str],
    attr_cols: list[str],
    as_of,
) -> tuple[DataFrame, DataFrame]:
    """Type-2 slowly-changing-dimension merge as a pure DataFrame
    transform: (current-version rows, incoming batch) → (new current
    set, rows to close).

    - new business key → opens a version (effective_from=as_of)
    - changed attributes (NULL-safe hash over ``attr_cols``) → closes
      the old version (effective_to=as_of) and opens a new one
    - unchanged → the existing version passes through untouched (NO
      spurious versions — the property tests pin this)

    One full-outer join on the business key; both sides carry an attr
    hash computed in codegen. ``as_of`` is an explicit timestamp
    (reproducible reruns), not a hidden current_timestamp().

    The reference's dimensions are truncate-reload snapshots with no
    history (locations, column_descriptions —
    notebooks/1_uscrn_scrape.ipynb:861-870); SCD2 is what a warehouse
    needs when those dims start drifting.
    """
    ts = F.lit(as_of).cast("timestamp")
    cur = row_hash(current, attr_cols).select(
        *[F.col(c).alias(f"_c_{c}") for c in current.columns],
        F.col("_row_hash").alias("_c_hash"),
    )
    inc = row_hash(batch, attr_cols).withColumnRenamed("_row_hash", "_i_hash")
    on = [inc[k].eqNullSafe(F.col(f"_c_{k}")) for k in key_cols]
    j = inc.join(cur, on, "full_outer")

    batch_cols = batch.columns
    is_new = F.col(f"_c_{key_cols[0]}").isNull()
    is_gone = inc[key_cols[0]].isNull()
    changed = (~is_new) & (~is_gone) & (F.col("_i_hash") != F.col("_c_hash"))

    opened = (
        j.filter(is_new | changed)
        .select(*[inc[c].alias(c) for c in batch_cols])
        .withColumn("effective_from", ts)
        .withColumn("effective_to", F.lit(None).cast("timestamp"))
        .withColumn("is_current", F.lit(True))
    )
    carried = j.filter(is_gone | ((~is_new) & (F.col("_i_hash") == F.col("_c_hash")))).select(
        *[F.col(f"_c_{c}").alias(c) for c in current.columns]
    )
    closed = (
        j.filter(changed)
        .select(*[F.col(f"_c_{c}").alias(c) for c in current.columns])
        .withColumn("effective_to", ts)
        .withColumn("is_current", F.lit(False))
    )
    return opened.unionByName(carried), closed


def diff_snapshots(
    old: DataFrame,
    new: DataFrame,
    key_cols: list[str],
) -> DataFrame:
    """Audit diff between two snapshots of the same table: one row per
    key that was ``added`` (only in new), ``removed`` (only in old), or
    ``changed`` (both sides, non-key content differs). Unchanged keys
    produce nothing — at 100 TB the diff is proportional to churn, the
    output never to the table.

    The content compare is ONE 8-byte xxhash64 of the non-key columns
    per side, computed before the join — the full-outer join carries
    (key, hash), never the row bodies, so wide tables diff at
    key-column shuffle cost (the same hash-not-rows decision as the
    idempotent append's anti-join). A 64-bit collision would mask one
    changed row per ~10¹⁹ — the same accepted envelope as every other
    hash in the engine, and the engine-agnostic SEMANTICS (classify by
    content equality) is what the oracle replays column-wise (qc0).

    Non-key columns are hashed in sorted-name order so the verdict is
    schema-order independent — and NULL-safely: Spark's multi-column
    ``xxhash64`` folds NULL inputs as a no-op, so ``(NULL, 'a')`` and
    ``('a', NULL)`` would hash EQUAL and mask a change. Hashing each
    column with its position as the seed and XOR-combining keeps a
    NULL's position visible (``xxhash64(lit(i))`` alone is a distinct
    non-null value per slot) without ANSI-mode overflow."""
    from functools import reduce

    body = sorted(c for c in old.columns if c not in key_cols)
    if body != sorted(c for c in new.columns if c not in key_cols):
        raise ValueError("snapshots must share a schema")

    def _row_hash(cols: list[str]):
        return reduce(
            lambda a, b: a.bitwiseXOR(b),
            [F.xxhash64(F.lit(i), F.col(c)) for i, c in enumerate(cols)],
        )

    o = old.select(*key_cols, _row_hash(body).alias("_h_old"))
    n = new.select(*key_cols, _row_hash(body).alias("_h_new"))
    j = o.join(n, key_cols, "full_outer")
    change = (
        F.when(F.col("_h_old").isNull(), F.lit("added"))
        .when(F.col("_h_new").isNull(), F.lit("removed"))
        .when(F.col("_h_old") != F.col("_h_new"), F.lit("changed"))
    )
    return (
        j.withColumn("change", change)
        .filter(F.col("change").isNotNull())
        .select(*key_cols, "change")
    )


def apply_changelog(
    base: DataFrame,
    changes: DataFrame,
    key_cols: list[str],
    *,
    seq_col: str = "seq",
    op_col: str = "op",
) -> DataFrame:
    """Apply an ordered CDC changelog (op ∈ I/U/D, monotone ``seq_col``
    per key) to a snapshot and return the resulting snapshot — the
    lakehouse "apply change data feed" op, complementing
    :meth:`Warehouse.merge_upsert` (one unordered delta) and
    :func:`scd2_merge` (history retention): here a key may be updated,
    deleted, and re-inserted in ONE feed and the outcome is whatever
    the LAST operation says.

    Plan: base rows enter the union as (seq = −∞) pseudo-inserts, then
    one window per key ordered by seq descending picks the latest
    operation, and a filter drops keys whose last op is D. One shuffle
    on the key; the window reads each row once. At 100 TB the base is
    the large side — it arrives pre-partitioned if stored bucketed by
    key (save_bucketed), leaving the changelog (churn-sized) as the
    only moved data. Replaying the same feed is idempotent: the final
    state depends only on (base, feed), not delivery count.

    ``changes`` must carry base's columns plus ``op_col``/``seq_col``;
    D rows only need the keys (payload columns are ignored).
    """
    data_cols = [c for c in base.columns if c not in key_cols]
    b = base.select(
        *key_cols,
        *data_cols,
        F.lit("I").alias("_op"),
        F.lit(None).cast("bigint").alias("_seq"),
    )
    c = changes.select(
        *key_cols,
        *data_cols,
        F.col(op_col).alias("_op"),
        F.col(seq_col).cast("bigint").alias("_seq"),
    )
    from pyspark.sql import Window

    # nulls_first: the base pseudo-insert sorts BELOW every feed seq
    w = Window.partitionBy(*key_cols).orderBy(F.col("_seq").desc_nulls_last())
    latest = (
        b.unionByName(c)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    return latest.filter(F.col("_op") != "D").select(*key_cols, *data_cols)


def fk_check(
    child: DataFrame,
    parent: DataFrame,
    child_key: str,
    parent_key: str,
) -> DataFrame:
    """Referential-integrity probe: one row with the child's row count
    and how many child rows reference a missing parent. The orphan scan
    is a LEFT ANTI join on the key — parent side reduced to its
    distinct keys first, so the join input is |parent keys|, not
    |parent rows| — and both counts come from one pass each. NULL
    foreign keys count as orphans (they reference nothing); relax
    upstream if NULLs are a modeled "no parent"."""
    keys = parent.select(F.col(parent_key).alias(child_key)).distinct()
    orphans = child.select(child_key).join(keys, [child_key], "left_anti")
    return child.agg(F.count(F.lit(1)).alias("n_child")).join(
        orphans.agg(F.count(F.lit(1)).alias("n_orphans"))
    )
