"""Delta Lake transaction log — jar-free reader/writer (S6).

A Delta table is plain parquet plus ``_delta_log/``: numbered JSON
commits whose actions (protocol / metaData / add / remove) define which
data files are live at each version. The format is publicly documented
(delta.io PROTOCOL.md); nothing here needs the Delta jar — this module
implements the subset the reference's pipeline actually exercises:

- **ACID appends/overwrites on a local or HDFS-style store**: a commit
  is ONE atomic file creation (``open(..., 'x')`` — create-if-absent,
  the same primitive real Delta uses via the LogStore), so concurrent
  writers conflict loudly instead of corrupting state, and readers see
  whole commits or nothing.
- **Snapshot isolation + time travel**: replaying actions up to version
  N yields exactly that version's file set (``version_as_of``).
- **Tombstones**: overwrite = remove-all + add-new in one commit; a
  plain parquet scan of the directory would double-count, the log read
  does not (this is precisely what the jar-gated fallback in
  ``readers.read_delta`` could not do — with this module it can).
- **Checkpoints**: every ``checkpoint_interval`` commits the full state
  is compacted into ``N.checkpoint.pylog.parquet`` + a PRIVATE
  ``_last_checkpoint.pylog`` pointer, so our readers replay O(interval)
  JSONs, not O(history). The spec's ``_last_checkpoint`` is deliberately
  NOT written: our checkpoint layout is private, and spec readers that
  never see a pointer simply replay the commit JSONs — which are spec.
  Jar-written standard checkpoints are still honored on read.

Scale notes: data files are written by Spark (distributed, partitioned
layout preserved — ``partitionBy`` dirs become Delta partitionValues);
only the LOG manipulation is driver-side, which matches real Delta (the
log is metadata, proportional to file count not data size). Checkpoint
read here is driver-side pyarrow — fine to ~10^5 files; the jar reads
it distributed beyond that (documented trade).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from ..localrel import local_df

_LOG = "_delta_log"


def _log_dir(path: str) -> str:
    return os.path.join(path, _LOG)


def _commit_file(path: str, version: int) -> str:
    return os.path.join(_log_dir(path), f"{version:020d}.json")


def is_delta_table(path: str) -> bool:
    return os.path.isdir(_log_dir(path))


def _existing_versions(path: str) -> list[int]:
    if not is_delta_table(path):
        return []
    out = []
    for f in os.listdir(_log_dir(path)):
        # exactly NNN...N.json — compacted/sidecar logs (x.y.compacted.json
        # etc.) are a newer protocol feature this reader must not
        # misparse as a plain commit
        if f.endswith(".json") and len(f) == 25 and f[:20].isdigit():
            out.append(int(f[:20]))
    return sorted(out)


def _replay(path: str, version_as_of: int | None = None):
    """(schema_json_str, partition_cols, {data_path: add_action}, meta)
    at the requested version — checkpoint (if usable) + JSON tail, else
    full JSON replay. ``meta`` is the LATEST metaData action seen (schema
    evolution: a later commit's metaData supersedes version 0's)."""
    versions = _existing_versions(path)
    if not versions:
        raise FileNotFoundError(f"no Delta log at {path}")
    target = versions[-1] if version_as_of is None else version_as_of
    if target not in versions:
        raise ValueError(f"version {target} not in log (have {versions})")

    meta: dict | None = None
    live: dict[str, dict] = {}
    start = 0
    ckpt = _read_last_checkpoint(path)
    if ckpt is not None and ckpt.get("parts"):
        # multi-part checkpoints are a feature of big jar-written tables;
        # refusing loudly beats silently reading part 1 of N
        raise NotImplementedError(
            "multi-part Delta checkpoint: this jar-free reader supports "
            "single-file checkpoints only"
        )
    if ckpt is not None and ckpt["version"] <= target:
        meta, live = _load_checkpoint(
            path, ckpt["version"], pylog=ckpt.get("_pylog", False)
        )
        start = ckpt["version"] + 1
    for v in versions:
        if v < start or v > target:
            continue
        with open(_commit_file(path, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "protocol" in action:
                    reader_v = action["protocol"].get("minReaderVersion", 1)
                    if reader_v > 1:
                        # deletion vectors / column mapping etc.: replaying
                        # adds alone would silently resurrect deleted rows
                        raise NotImplementedError(
                            f"Delta minReaderVersion={reader_v}: this "
                            "jar-free reader implements reader protocol 1 "
                            "(plain add/remove); refusing rather than "
                            "returning wrong rows"
                        )
                elif "metaData" in action:
                    meta = action["metaData"]
                elif "add" in action:
                    live[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
    if meta is None:
        raise ValueError(f"no metaData action in log at {path}")
    return meta["schemaString"], meta.get("partitionColumns", []), live, meta


def _schemas_equal(a: str, b: str) -> bool:
    """schemaString equality up to JSON formatting (key order/whitespace
    differ between writers; the parsed structure is what matters)."""
    return json.loads(a) == json.loads(b)


def read_delta_pylog(
    spark: SparkSession, path: str, version_as_of: int | None = None
) -> DataFrame:
    """Delta read without the jar: resolve the live file set from the
    log (never a directory listing — tombstoned files are skipped) and
    scan exactly those parquet files with the log's schema. Partitioned
    tables recover partition columns from the ``k=v`` layout via
    ``basePath`` — the same directory convention Delta itself writes."""
    schema_str, part_cols, live, _meta = _replay(path, version_as_of)
    schema = StructType.fromJson(json.loads(schema_str))
    files = [os.path.join(path, p) for p in sorted(live)]
    if not files:
        return local_df(spark, [], schema)
    reader = spark.read.schema(schema)
    if part_cols:
        reader = reader.option("basePath", path)
    return reader.parquet(*files)


def write_delta_pylog(
    df: DataFrame,
    path: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    checkpoint_interval: int = 10,
    txn: tuple[str, int] | None = None,
    data_change: bool = True,
) -> int:
    """Commit ``df`` to a Delta log without the jar; returns the new
    version. ``mode='append'`` adds files; ``mode='overwrite'`` removes
    every live file and adds the new ones IN THE SAME COMMIT (readers
    see old or new, never both). The commit file is created with
    ``open('x')``: if a concurrent writer took the version, this raises
    instead of overwriting — the caller retries on the next version,
    exactly the optimistic-concurrency loop of the real LogStore.

    ``txn=(app_id, version)`` stamps the commit with Delta's idempotent-
    writer action (see :func:`streaming_delta_sink`);
    ``data_change=False`` marks a layout-only rewrite (compaction) whose
    adds/removes streaming readers must skip."""
    spark = df.sparkSession
    os.makedirs(_log_dir(path), exist_ok=True)
    if mode == "append" and _existing_versions(path):
        # fail BEFORE writing data files: an append that mismatches the
        # table schema would otherwise strand its parquet until vacuum
        schema_str, cur_parts, _live, _m = _replay(path)
        if not _schemas_equal(schema_str, df.schema.json()) or (
            (partition_by or []) != cur_parts
        ):
            raise ValueError(
                f"append schema mismatch at {path}: table has "
                f"{schema_str} / partitions {cur_parts}, append brings "
                f"{df.schema.json()} / partitions {partition_by or []}; "
                "use mode='overwrite' to evolve the schema"
            )
    staging = os.path.join(path, f".staging-{uuid.uuid4().hex}")
    writer = df.write.mode("overwrite")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(staging)

    # move data files into the table root, delta-style unique names,
    # preserving k=v partition dirs so basePath recovers the columns
    adds = []
    now = int(time.time() * 1000)
    for root, _dirs, fnames in os.walk(staging):
        for f in fnames:
            if not f.endswith(".parquet"):
                continue
            rel_dir = os.path.relpath(root, staging)
            rel_dir = "" if rel_dir == "." else rel_dir
            part_values = dict(
                seg.split("=", 1) for seg in rel_dir.split(os.sep) if "=" in seg
            )
            new_name = f"part-{uuid.uuid4().hex}.snappy.parquet"
            rel_path = os.path.join(rel_dir, new_name) if rel_dir else new_name
            dest = os.path.join(path, rel_path)
            os.makedirs(os.path.dirname(dest), exist_ok=True)
            shutil.move(os.path.join(root, f), dest)
            adds.append(
                {
                    "add": {
                        "path": rel_path.replace(os.sep, "/"),
                        "partitionValues": part_values,
                        "size": os.path.getsize(dest),
                        "modificationTime": now,
                        "dataChange": data_change,
                    }
                }
            )
    shutil.rmtree(staging)

    versions = _existing_versions(path)
    version = (versions[-1] + 1) if versions else 0
    actions: list[dict] = []
    if version == 0:
        actions.append(
            {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}}
        )
        actions.append(
            {
                "metaData": {
                    "id": str(uuid.uuid4()),
                    "format": {"provider": "parquet", "options": {}},
                    "schemaString": df.schema.json(),
                    "partitionColumns": partition_by or [],
                    "configuration": {},
                    "createdTime": now,
                }
            }
        )
    else:
        schema_str, cur_parts, live, cur_meta = _replay(path)
        schema_changed = not _schemas_equal(schema_str, df.schema.json())
        parts_changed = (partition_by or []) != cur_parts
        if mode == "overwrite":
            # schema evolution by overwrite (the jar's overwriteSchema):
            # refresh metaData IN the overwrite commit so readers never
            # apply a stale schema to the new files — the alternative is
            # silently-NULL missing columns (ADVICE r4, medium)
            if schema_changed or parts_changed:
                new_meta = dict(cur_meta)
                new_meta["schemaString"] = df.schema.json()
                new_meta["partitionColumns"] = partition_by or []
                actions.append({"metaData": new_meta})
            for p in sorted(live):
                actions.append(
                    {
                        "remove": {
                            "path": p,
                            "deletionTimestamp": now,
                            "dataChange": data_change,
                        }
                    }
                )
        elif schema_changed or parts_changed:
            # append must match the table schema exactly — refusing loudly
            # beats committing files the log's schema will misread. This
            # re-check fires only on the TOCTOU path (a concurrent
            # schema-evolving commit landed between the early pre-check
            # and here), AFTER the staged files were moved into the table
            # root — remove them before propagating, or the raise itself
            # would strand exactly the orphans the pre-check exists to
            # prevent (no commit references them, so deletion is safe).
            for a in adds:
                try:
                    os.remove(os.path.join(path, a["add"]["path"]))
                except OSError:
                    pass
            raise ValueError(
                f"append schema mismatch at {path}: table has "
                f"{schema_str} / partitions {cur_parts}, append brings "
                f"{df.schema.json()} / partitions {partition_by or []}; "
                "use mode='overwrite' to evolve the schema"
            )
    if txn is not None:
        actions.append({"txn": {"appId": txn[0], "version": int(txn[1])}})
    actions.extend(adds)
    actions.append(
        {
            "commitInfo": {
                "timestamp": now,
                "operation": "WRITE",
                "operationParameters": {"mode": mode},
            }
        }
    )
    # atomic create-if-absent: the whole commit appears at once or the
    # version is taken and we raise (optimistic concurrency)
    with open(_commit_file(path, version), "x") as fh:
        fh.write("\n".join(json.dumps(a) for a in actions) + "\n")

    if checkpoint_interval and version > 0 and version % checkpoint_interval == 0:
        _write_checkpoint(path, version)
    return version


# ---------------------------------------------------------------------------
# checkpoints
# ---------------------------------------------------------------------------


def _read_last_checkpoint(path: str) -> dict | None:
    """Checkpoint pointer, preferring OUR private one. We deliberately do
    NOT write the spec's ``_last_checkpoint``: our checkpoint layout is
    JSON-strings-per-column, and a jar reader that followed the standard
    pointer would choke on it (ADVICE r4) — with only the private pointer
    present, spec readers simply replay the commit JSONs, which ARE spec.
    Jar-written tables still work: their standard pointer + typed
    checkpoint is read when no private pointer exists."""
    for fname, pylog in (("_last_checkpoint.pylog", True), ("_last_checkpoint", False)):
        f = os.path.join(_log_dir(path), fname)
        if os.path.exists(f):
            with open(f) as fh:
                info = json.load(fh)
            info["_pylog"] = pylog
            return info
    return None


def _checkpoint_file(path: str, version: int, pylog: bool = True) -> str:
    suffix = "checkpoint.pylog.parquet" if pylog else "checkpoint.parquet"
    return os.path.join(_log_dir(path), f"{version:020d}.{suffix}")


def _write_checkpoint(path: str, version: int) -> None:
    """Compact the state at ``version`` into one parquet file + a PRIVATE
    ``_last_checkpoint.pylog`` pointer — our readers then replay only
    newer JSONs, while spec readers (which never see the private pointer)
    replay the full JSON log, every line of which is spec-conformant."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    schema_str, part_cols, live, meta = _replay(path, version)
    rows = [
        {
            "metaData": json.dumps(
                {
                    "schemaString": schema_str,
                    "partitionColumns": part_cols,
                    "id": meta.get("id"),
                }
            ),
            "add": None,
        }
    ]
    for p in sorted(live):
        rows.append({"metaData": None, "add": json.dumps(live[p])})
    table = pa.Table.from_pylist(rows)
    pq.write_table(table, _checkpoint_file(path, version, pylog=True))
    tmp = os.path.join(_log_dir(path), "_last_checkpoint.pylog.tmp")
    with open(tmp, "w") as fh:
        json.dump({"version": version, "size": len(rows)}, fh)
    os.replace(tmp, os.path.join(_log_dir(path), "_last_checkpoint.pylog"))


def _load_checkpoint(path: str, version: int, pylog: bool = True):
    """State from a single-file checkpoint. Handles BOTH layouts: ours
    (JSON strings per action column) and the jar's (typed structs, which
    pyarrow hands back as dicts) — including the protocol row, which for
    jar-written tables lives in the checkpoint rather than a replayed
    JSON commit, so the minReaderVersion guard must fire here too."""
    import pyarrow.parquet as pq

    def _as_dict(v):
        return json.loads(v) if isinstance(v, str) else v

    table = pq.read_table(_checkpoint_file(path, version, pylog=pylog)).to_pylist()
    meta = None
    live: dict[str, dict] = {}
    for row in table:
        if row.get("protocol"):
            p = _as_dict(row["protocol"])
            reader_v = (p or {}).get("minReaderVersion", 1)
            if reader_v and reader_v > 1:
                raise NotImplementedError(
                    f"Delta minReaderVersion={reader_v} (from checkpoint): "
                    "this jar-free reader implements reader protocol 1"
                )
        if row.get("metaData"):
            m = _as_dict(row["metaData"])
            meta = {
                "id": m.get("id") or str(uuid.uuid4()),
                "format": m.get("format") or {"provider": "parquet", "options": {}},
                "schemaString": m["schemaString"],
                "partitionColumns": m["partitionColumns"],
                "configuration": m.get("configuration") or {},
            }
        if row.get("add"):
            a = _as_dict(row["add"])
            live[a["path"]] = a
    return meta, live


def delta_merge_upsert(
    spark: SparkSession, path: str, updates: DataFrame, key: str
) -> int:
    """Jar-free MERGE INTO (whole-table form): read the current snapshot
    through the log, apply ``operators.relational.merge_upsert`` (update
    matched keys, insert new ones), commit the result as ONE overwrite —
    readers see the pre- or post-merge table, never a mix. The jar's
    MERGE rewrites only touched files; this form rewrites the table, the
    right trade for dimension-sized targets (the reference's upsert
    surface) and the documented jar-only gap for fact-sized ones."""
    from ..operators.relational import merge_upsert

    current = read_delta_pylog(spark, path)
    merged = merge_upsert(current, updates, key)
    return write_delta_pylog(merged, path, mode="overwrite")


def delta_version_diff(
    spark: SparkSession,
    path: str,
    v_from: int,
    v_to: int,
    key_cols: list[str],
) -> DataFrame:
    """Change-Data-Feed-lite: what changed between two versions of a
    Delta table, as ``operators.relational.snapshot_diff`` rows (one row
    per divergent key: added / removed / changed + the column names that
    moved). Real CDF materializes per-commit change files at write time;
    diffing two time-travel snapshots reconstructs the same answer for
    keyed tables at the cost of reading both versions — no jar, no
    write-path cooperation needed."""
    from ..operators.relational import snapshot_diff

    old = read_delta_pylog(spark, path, version_as_of=v_from)
    new = read_delta_pylog(spark, path, version_as_of=v_to)
    return snapshot_diff(old, new, key_cols)


# ---------------------------------------------------------------------------
# streaming idempotency (txn), compaction (OPTIMIZE-lite), vacuum
# ---------------------------------------------------------------------------


def last_txn_version(
    path: str, app_id: str, from_version: int = 0
) -> tuple[int, int]:
    """(highest committed ``txn`` version for ``app_id`` or -1, last log
    version scanned) — the Delta idempotent-writer protocol: a streaming
    sink stamps each commit with (appId, batchVersion), and on
    at-least-once replay skips batches it already owns. ``from_version``
    lets a long-lived caller scan only the log TAIL it has not seen
    (commit JSONs are never deleted here, so a tail scan composes with
    any earlier full scan)."""
    best = -1
    last = from_version - 1
    for v in _existing_versions(path):
        if v < from_version:
            continue
        last = max(last, v)
        with open(_commit_file(path, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                txn = action.get("txn")
                if txn and txn.get("appId") == app_id:
                    best = max(best, int(txn["version"]))
    return best, last


def streaming_delta_sink(path: str, app_id: str):
    """foreachBatch sink with Delta's txn-based exactly-once contract:
    ``writeStream.foreachBatch(streaming_delta_sink(path, app))``. Spark
    guarantees at-least-once batch delivery; the (appId, epoch) txn
    action recorded IN the same atomic commit as the data makes replays
    detectable, so a crash after commit but before checkpoint advances
    re-delivers the batch and the sink skips it — the jar's
    ``txnAppId``/``txnVersion`` option, reimplemented on the log.

    The closure scans the full log ONCE (restart recovery), then only
    the tail of versions it has not yet seen — per-epoch cost stays
    O(new commits), not O(history), over a stream's lifetime."""
    state = {"best": -1, "next_scan": 0}

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        best_new, last = last_txn_version(path, app_id, state["next_scan"])
        state["best"] = max(state["best"], best_new)
        state["next_scan"] = last + 1
        if epoch_id <= state["best"]:
            return  # replayed batch: already durably committed
        v = write_delta_pylog(
            batch_df, path, mode="append", txn=(app_id, epoch_id)
        )
        state["best"] = max(state["best"], epoch_id)
        state["next_scan"] = max(state["next_scan"], v + 1)

    return sink


def compact_delta(
    spark: SparkSession, path: str, target_partitions: int = 1
) -> int:
    """OPTIMIZE-lite: rewrite the live file set into ``target_partitions``
    files in ONE commit whose add/remove actions carry
    ``dataChange=false`` — the table's ROWS are unchanged (streaming
    readers of the log know to skip the commit as a no-op), only the
    file layout improves. This is the small-file antidote for streaming
    ingest at scale: many per-batch files become a few scan-friendly
    ones, while every historical version stays readable."""
    current = read_delta_pylog(spark, path)
    return write_delta_pylog(
        current.coalesce(target_partitions),
        path,
        mode="overwrite",
        data_change=False,
    )


def vacuum_delta(path: str, retention_ms: int = 7 * 24 * 3600 * 1000) -> int:
    """Delete data files no version ≤ retention references: tombstones
    removed longer than ``retention_ms`` ago, AND parquet files the log
    never tracked at all (stranded by a writer that moved data files in
    but lost the commit race / crashed before committing — real VACUUM
    removes untracked files for exactly this reason, else every
    conflict leaks storage forever). Returns the number deleted. The
    standard trade: storage is reclaimed, but time travel to versions
    referencing deleted files now fails — hence a week, not zero, as the
    default retention. The log itself is never deleted (metadata is
    cheap; history stays auditable)."""
    now = int(time.time() * 1000)
    removed_at: dict[str, int] = {}
    ever_added: set[str] = set()
    live_now: set[str] = set()
    for v in _existing_versions(path):
        with open(_commit_file(path, v)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                action = json.loads(line)
                if "remove" in action:
                    r = action["remove"]
                    removed_at[r["path"]] = r.get("deletionTimestamp", now)
                    live_now.discard(r["path"])
                elif "add" in action:
                    ever_added.add(action["add"]["path"])
                    live_now.add(action["add"]["path"])
                    removed_at.pop(action["add"]["path"], None)
    n = 0
    for rel, ts in removed_at.items():
        if rel in live_now or now - ts < retention_ms:
            continue
        full = os.path.join(path, rel)
        if os.path.exists(full):
            os.remove(full)
            n += 1
    # orphans: data files present on disk that NO commit ever added
    for root, dirs, fnames in os.walk(path):
        dirs[:] = [d for d in dirs if d != _LOG and not d.startswith(".staging-")]
        for f in fnames:
            if not f.endswith(".parquet"):
                continue
            full = os.path.join(root, f)
            rel = os.path.relpath(full, path).replace(os.sep, "/")
            if rel in ever_added:
                continue
            if now - int(os.path.getmtime(full) * 1000) >= retention_ms:
                os.remove(full)
                n += 1
    return n
