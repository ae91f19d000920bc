"""Batch sinks — SURVEY.md §2.1 S4/S5/S6.

The reference writes DWD facts to Kafka topics, DWS aggregates to
ClickHouse, and dimension snapshots to HBase/Phoenix [R]. The batch
equivalents here are parquet layouts chosen for the 100 TB read
path:

- fact tables partitioned by event date (`dt=YYYY-MM-DD/`): partition
  pruning turns time-range queries into directory listings;
- dimension snapshots as small overwrite tables (the HBase upsert →
  full-snapshot-overwrite mapping, correct because dims are small);
- DWS-style aggregate outputs written once per window, idempotent
  (same input → same files), so replays are safe — the batch face of
  streaming/sinks.upsert_latest_by_key.

The streaming faces (writeStream kafka / foreachBatch JDBC) live in
flink_realtime_edu_spark/streaming/sinks.py.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_fact_partitioned(
    df: DataFrame, path: str, ts_col: str = "ts", mode: str = "overwrite"
) -> None:
    """Write a fact table date-partitioned on its event time.

    `dt` is derived, low-cardinality (one dir per day) and prunable;
    at 100 TB add a second bucket-ish key (e.g. hash(user_id) % N)
    only if single days exceed comfortable file counts."""
    (
        df.withColumn("dt", F.date_format(ts_col, "yyyy-MM-dd"))
        .repartition("dt")  # one writer wave per partition dir
        .write.partitionBy("dt")
        .mode(mode)
        .parquet(path)
    )


def write_dim_snapshot(df: DataFrame, path: str) -> None:
    """Overwrite a dimension snapshot (S6). Dims are small by
    definition (they get broadcast in J3); coalesce to a single file
    so the broadcast read is one footer fetch."""
    df.coalesce(1).write.mode("overwrite").parquet(path)


def read_fact_partitioned(spark, path: str) -> DataFrame:
    """Read back a date-partitioned fact; `dt` filters prune
    directories before any IO (PartitionFilters in the explain)."""
    return spark.read.parquet(path)


def export_training_shards(
    df: DataFrame, path: str, n_shards: int, key_col: str, salt: str = "v1"
) -> None:
    """Deterministic sharded + shuffled training-data export.

    Training loaders want (a) fixed-count shards a 1000-worker job
    can claim independently, (b) rows shuffled so each shard is an
    unbiased sample (no source/time clumping), (c) bit-identical
    re-runs (resumable pipelines, reproducible ablations). All three
    come from hashing, never from randomness or a global sort:

    - shard  = pmod(xxhash64(key, salt), n_shards) — balanced by the
      hash, stable across runs and partitionings;
    - within-shard order = xxhash64(key, salt||'#order') — a
      deterministic shuffle (sortWithinPartitions after a shard
      repartition: per-shard local sort, no global exchange).

    One keyed shuffle total; scales linearly in rows. The salt
    versions the permutation — bump it to reshuffle epochs without
    touching the data.
    """
    shard = F.pmod(F.xxhash64(F.col(key_col), F.lit(salt)), F.lit(n_shards))
    order = F.xxhash64(F.col(key_col), F.lit(salt + "#order"))
    (
        df.withColumn("shard", shard.cast("int"))
        .withColumn("_ord", order)
        .repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "_ord")
        .drop("_ord")
        .write.partitionBy("shard")
        .mode("overwrite")
        .parquet(path)
    )


def write_clustered(
    df: DataFrame,
    path: str,
    ts_col: str = "ts",
    cluster_cols: list[str] | None = None,
    files_per_day: int = 1,
    mode: str = "overwrite",
    n_days: int | None = None,
) -> None:
    """Date-partitioned + CLUSTERED fact layout: within each `dt=`
    directory, rows are range-distributed and sorted on
    ``cluster_cols`` — the poor man's Z-order for the 1-D case, and
    the layout every 100 TB point-lookup path wants:

    - `dt` filters prune directories before any IO (as in
      :func:`write_fact_partitioned`);
    - `cluster_cols` filters prune ROW GROUPS via parquet min/max
      stats: sorting makes each row group's [min, max] window narrow
      and disjoint, so a `user_id = X` scan reads ~1 row group per
      day instead of every file (unsorted layouts have every row
      group spanning the full id range — stats prune nothing).

    `repartitionByRange` on (dt, cluster) gives ``files_per_day``
    non-overlapping files per day (range boundaries from a sampled
    sketch — deterministic enough for layout; rows are EXACTLY
    distributed by the subsequent partitionBy regardless), and
    `sortWithinPartitions` orders rows inside each file so row-group
    boundaries cut the cluster key into consecutive ranges. One
    range shuffle total; no global sort.

    Layout quality (disjoint, narrow per-row-group ranges) is pinned
    by tests/test_sinks.py with pyarrow footer inspection.
    """
    cluster_cols = cluster_cols or []
    dtd = df.withColumn("dt", F.date_format(ts_col, "yyyy-MM-dd"))
    probed = False
    if cluster_cols:
        # The day-count probe is an extra job over the input — only
        # pay it when the range layout needs a target count and the
        # caller didn't supply one. Persist around probe + write so
        # (a) the input lineage is computed once, not twice, and
        # (b) a non-deterministic upstream can't show the two jobs
        # different rows.
        if n_days is None:
            dtd.persist()
            probed = True
            n_days = dtd.select("dt").distinct().count()
        clustered = dtd.repartitionByRange(
            max(n_days * files_per_day, 1),
            F.col("dt"),
            *[F.col(c) for c in cluster_cols],
        ).sortWithinPartitions("dt", *cluster_cols)
    else:
        clustered = dtd.repartition("dt")
    try:
        clustered.write.partitionBy("dt").mode(mode).parquet(path)
    finally:
        if probed:
            dtd.unpersist()


# ---------------------------------------------------------------------------
# Transactional batch writes — commit-log + atomic publish (the
# exactly-once-SINK demo: SURVEY.md exhaustiveness note / VERDICT r4
# item 5). The Flink family gets end-to-end exactly-once from 2PC
# sinks; the warehouse-native equivalent (Delta/Iceberg's idea,
# minimal form) is snapshot isolation via a manifest log: data files
# land invisibly, an atomic create-if-absent link publishes them (a
# seq-CAS that serializes CONCURRENT committers of different
# transactions, Delta-style), readers only trust committed
# manifests. Local-POSIX-FS assumptions as streaming/dedup.py; on
# object stores the link becomes the store's atomic put-if-absent.
# ---------------------------------------------------------------------------

_TXN_DATA = "data"
_TXN_LOG = "_commitlog"
# Published entries are EXACTLY `<10-digit seq>.json` — the SEQ ALONE
# names the file so the create-if-absent link is a true per-seq CAS
# (a name embedding the txn id would never collide across committers,
# silently allowing duplicate seqs); the txn id lives inside the
# manifest. Listing parses this strict shape instead of globbing:
# pathlib's glob matches dotfiles, so the `.tmp-*` staging manifest
# would count as committed after a crash between write_text and the
# publishing link.
_TXN_ENTRY_RE = re.compile(r"^(\d{10})\.json$")
# Checkpoints (`<seq>.checkpoint.json`) deliberately fail the entry
# regex so the two listings never cross-match.
_TXN_CKPT_RE = re.compile(r"^(\d{10})\.checkpoint\.json$")
# Pre-CAS layout (`<seq>-<txn_id>.json`, r5 first half). Detected so a
# table written by the old code fails LOUDLY instead of silently
# reading as empty (which would also defeat its replay protection).
_TXN_LEGACY_RE = re.compile(r"^(\d{10})-(.+)\.json$")


def _txn_read_manifest(p):
    """Manifest JSON, with the two racing/broken cases separated:
    vanished-under-us (a concurrent vacuum's reclaim — callers skip;
    their contiguity checks turn any real gap into a loud error) vs
    corrupt content (raises — a damaged log must never be silently
    narrowed, that would also re-admit an already-committed txn_id)."""
    import json

    try:
        return json.loads(p.read_text())
    except FileNotFoundError:
        return None
    except (json.JSONDecodeError, KeyError, UnicodeDecodeError) as e:
        raise ValueError(f"corrupt commit-log manifest: {p}") from e


def _txn_entries(log) -> list:
    """(seq, txn_id, Path) for published commit entries only, in
    commit (= seq) order; staging/checkpoint/foreign files are
    ignored. Reads each manifest for its txn id — the live log stays
    short because checkpoints absorb old entries."""
    if not log.is_dir():
        return []
    out = []
    for p in sorted(log.iterdir()):
        if _TXN_LEGACY_RE.match(p.name):
            raise ValueError(
                f"commit log {log} uses the pre-CAS '<seq>-<txn_id>.json'"
                " layout; migrate by renaming each entry to '<seq>.json'"
                " (the txn id is already inside the manifest)"
            )
        m = _TXN_ENTRY_RE.match(p.name)
        if m:
            manifest = _txn_read_manifest(p)
            if manifest is None:
                continue  # reclaimed by a concurrent vacuum
            if "txn_id" not in manifest:
                raise ValueError(f"corrupt commit-log manifest: {p}")
            out.append((int(m.group(1)), manifest["txn_id"], p))
    return out


def _txn_checkpoints(log) -> list:
    """(seq, manifest dict) for published checkpoints, seq ascending;
    tolerates a manifest vanishing under a concurrent vacuum exactly
    like the entry listing."""
    if not log.is_dir():
        return []
    out = []
    for p in sorted(log.iterdir()):
        m = _TXN_CKPT_RE.match(p.name)
        if m:
            manifest = _txn_read_manifest(p)
            if manifest is None:
                continue  # reclaimed by a concurrent vacuum
            out.append((int(m.group(1)), manifest))
    return out


def txn_committed(table_dir: str) -> list[str]:
    """ALL transaction ids in commit order — ids compacted into the
    latest checkpoint (whose original entries may have been vacuumed)
    followed by ids of surviving log entries after it. Verifies the
    surviving entries are CONTIGUOUS above the checkpoint: a listing
    racing two whole maintenance generations fails loudly instead of
    returning a silently incomplete history."""
    from pathlib import Path

    log = Path(table_dir) / _TXN_LOG
    cps = _txn_checkpoints(log)
    entries = _txn_entries(log)
    lo = cps[-1][0] if cps else -1
    tail = [(s, t) for s, t, _ in entries if s > lo]
    seqs = [s for s, _ in tail]
    if seqs != list(range(lo + 1, lo + 1 + len(seqs))):
        raise ValueError(
            f"commit log has a gap above seq {lo} (got seqs {seqs}): "
            "listing raced concurrent maintenance — retry"
        )
    ids = list(cps[-1][1]["txn_ids"]) if cps else []
    return ids + [t for _, t in tail]


def txn_write(df: DataFrame, table_dir: str, txn_id: str, write_fn=None) -> bool:
    """Write `df` into the table as one atomic, idempotent transaction.

    Protocol (crash-safe at every step):

    1. data files land under ``data/txn=<txn_id>/`` — a dir no reader
       ever lists directly, so a crash mid-write leaves INVISIBLE
       orphans, never partial results;
    2. a manifest ``<seq>.json`` (txn id + file list) is written
       to a temp name and PUBLISHED with one atomic create-if-absent
       link into ``_commitlog/`` — the only step that changes
       visibility, and the seq-CAS that lets CONCURRENT committers of
       different transactions serialize optimistically (lose the seq
       race → re-list, retry at the new head — the Delta protocol;
       put-if-absent on an object store);
    3. replaying a txn_id whose commit entry already exists skips both
       steps (returns False): at-least-once driver retries yield
       exactly-once table state. Concurrent retries of the SAME
       txn_id are the one thing left to the caller — retries are
       sequential by nature.

    ``write_fn(df, dir)`` overrides the physical write (e.g. a
    clustered layout via :func:`write_clustered`); default is plain
    parquet. All txns of one table must share one layout and schema
    (as in any table format) — :func:`txn_read` unions their dirs in
    a single scan. Returns True iff this call published the commit.
    """
    import json
    import os
    from pathlib import Path

    table = Path(table_dir)
    log = table / _TXN_LOG
    log.mkdir(parents=True, exist_ok=True)
    # One listing pass serves both the replay check and the seq
    # computation (the log can be long-lived; don't walk it thrice).
    entries = _txn_entries(log)
    cps = _txn_checkpoints(log)
    # Replay check spans live entries AND ids absorbed into the
    # latest checkpoint — a txn vacuumed after compaction must still
    # be recognized, or an at-least-once retry would duplicate it.
    seen = {t for _, t, _ in entries}
    if cps:
        seen.update(cps[-1][1]["txn_ids"])
    if txn_id in seen:
        return False  # already committed — replay is a no-op
    data_dir = table / _TXN_DATA / f"txn={txn_id}"
    # Overwrite handles a prior crashed attempt's partial files.
    if write_fn is None:
        df.write.mode("overwrite").parquet(str(data_dir))
    else:
        write_fn(df, str(data_dir))
    # rglob: a partitioned write_fn (e.g. write_clustered) nests
    # files under dt=… subdirs; record table-relative paths.
    files = sorted(
        str(p.relative_to(data_dir)) for p in data_dir.rglob("*.parquet")
    )
    # Staging name deliberately fails _TXN_ENTRY_RE: a crash here
    # leaves an inert file that is never listed, counted, or read.
    tmp = log / f".tmp-{txn_id}.json"
    # OPTIMISTIC CONCURRENCY on the log (the Delta model): claim the
    # next seq with an atomic create-if-absent (os.link fails with
    # EEXIST if another committer won the seq; on an object store
    # this is the put-if-absent). Losing a race means re-listing and
    # retrying at the new head — different transactions serialize
    # without a coordinator. Concurrent retries of the SAME txn_id
    # remain the caller's contract (retries are sequential by
    # nature); the re-check inside the loop closes the window where
    # the other committer published this very txn_id.
    while True:
        entries = _txn_entries(log)
        cps = _txn_checkpoints(log)
        seen = {t for _, t, _ in entries}
        if cps:
            seen.update(cps[-1][1]["txn_ids"])
        if txn_id in seen:
            tmp.unlink(missing_ok=True)
            return False  # another committer published this txn
        # max-seq + 1, not a count: vacuum may have removed entries.
        used = [s for s, _, _ in entries] + [s for s, _ in cps]
        seq = max(used) + 1 if used else 0
        tmp.write_text(json.dumps({"txn_id": txn_id, "seq": seq, "files": files}))
        # The filename is the seq ALONE, so this link collides with
        # ANY other committer claiming the same seq — a true CAS.
        final = log / f"{seq:010d}.json"
        try:
            os.link(tmp, final)  # atomic fail-if-exists publish
        except FileExistsError:
            continue  # lost the seq race — re-list and retry
        tmp.unlink()
        return True


def txn_read(spark, table_dir: str, as_of: int | None = None) -> DataFrame:
    """Snapshot read: union of exactly the COMMITTED transactions'
    data dirs — uncommitted/orphaned txn dirs are invisible. Empty
    committed set → empty frame with no schema guess, so callers
    should handle the None.

    ``as_of`` gives TIME TRAVEL (the Delta/Iceberg VERSION AS OF
    idea): read the table as of commit seq ``as_of`` inclusive.

    A published CHECKPOINT (see :func:`txn_compact`) substitutes one
    compacted dir for every commit it covers, so the scan lists
    O(commits since last checkpoint) dirs instead of O(all commits) —
    the small-files discipline a long-lived table needs. Snapshots at
    or after a checkpoint stay reproducible forever; snapshots BEFORE
    one survive until :func:`txn_vacuum` reclaims the superseded
    commits (then they raise, like Delta time travel past VACUUM).

    Concurrent-vacuum race (r8, caught by the boundary-read storm
    test): between resolving the log and Spark's file listing a
    racing vacuum may delete a resolved dir, surfacing as a raw
    AnalysisException instead of the loud 'vacuumed' contract error.
    The read therefore RE-RESOLVES against a fresh log snapshot on a
    listing failure: if the snapshot is now non-reproducible the
    loud ValueError raises (translated, never flapping back), and a
    still-reproducible resolution (head advanced under a head read)
    simply retries. The remaining unavoidable window is EXECUTION
    time on an already-listed plan — bounded by ``keep_generations``
    exactly as txn_vacuum documents (two full compact+vacuum
    generations must complete inside one scan)."""
    from pathlib import Path

    from pyspark.errors import AnalysisException

    table = Path(table_dir)
    log = table / _TXN_LOG

    def resolve() -> list[str] | None:
        entries = _txn_entries(log)
        cps = _txn_checkpoints(log)
        if not entries and not cps:
            return None
        head = max(
            [s for s, _, _ in entries] + [s for s, _ in cps]
        )
        if as_of is not None and as_of > head:
            # A version beyond the head is a caller error (typo'd/
            # stale seq) — returning the head snapshot would hand back
            # plausible but WRONG data. Delta raises on a nonexistent
            # version; so do we.
            raise ValueError(
                f"as_of={as_of} is beyond the table head (seq {head})"
            )
        target = head if as_of is None else as_of
        usable = [(s, cp) for s, cp in cps if s <= target]
        dirs: list[str] = []
        lo = -1  # highest seq already covered
        if usable:
            cp_seq, cp = usable[-1]
            dirs.append(str(table / cp["data_dir"]))
            lo = cp_seq
        selected = [(s, t) for s, t, _ in entries if lo < s <= target]
        # The snapshot is reproducible iff the covered seqs are
        # exactly lo+1 .. min(target, head) with no holes — a crash
        # mid-vacuum (or a foreign deletion) must fail LOUDLY here,
        # never return a silently partial table. (Commit seqs are
        # contiguous by construction; vacuum only removes a prefix.)
        want_seqs = set(range(lo + 1, min(target, head) + 1))
        if {s for s, _ in selected} != want_seqs:
            raise ValueError(
                f"snapshot as_of={target} is no longer reproducible: "
                "its commits were compacted and vacuumed"
            )
        dirs += [str(table / _TXN_DATA / f"txn={t}") for _, t in selected]
        return dirs or None

    last_exc: Exception | None = None
    for _ in range(5):
        dirs = resolve()
        if dirs is None:
            return None
        try:
            return spark.read.parquet(*dirs)
        except AnalysisException as e:
            # A vacuum won the listing race: re-resolve from the
            # fresh log — either the loud ValueError raises on the
            # next resolve() (snapshot reclaimed) or the new
            # resolution lists live dirs and the retry succeeds.
            last_exc = e
    raise last_exc


def txn_commit_dirs_scanned(table_dir: str) -> int:
    """How many data dirs a HEAD snapshot read lists — the
    small-files health metric compaction exists to bound: 1 (latest
    checkpoint) + commits since it, or all commits if never
    compacted."""
    from pathlib import Path

    log = Path(table_dir) / _TXN_LOG
    entries = _txn_entries(log)
    cps = _txn_checkpoints(log)
    if not cps:
        return len(entries)
    cp_seq = cps[-1][0]
    return 1 + sum(1 for s, _, _ in entries if s > cp_seq)


def txn_compact(
    spark, table_dir: str, n_files: int | None = None
) -> bool:
    """Publish a CHECKPOINT: rewrite every commit up to the current
    head into one compacted dir and one manifest — the Delta
    checkpoint idea applied to both the log and the data. After N
    small commits a snapshot read lists N dirs of small files; the
    checkpoint collapses them to one dir (``n_files`` files via
    coalesce — no shuffle), after which reads list 1 + (commits
    since) dirs. Old commits stay readable for time travel until
    :func:`txn_vacuum`.

    Crash-safe like txn_write: the compacted data lands in a dir no
    reader lists (only a published manifest makes it visible), and
    the manifest publishes with one atomic create-if-absent link.
    Concurrency-safe against live committers: the snapshot, the
    manifest's id list, and the covered range are all pinned to the
    head observed at entry (a commit landing mid-compaction simply
    stays outside the checkpoint), and two racing compactions at the
    same head resolve via the link (loser sees EEXIST → False).
    Idempotent: a checkpoint at the current head already existing is
    a no-op (returns False)."""
    import json
    import os
    from pathlib import Path

    table = Path(table_dir)
    log = table / _TXN_LOG
    entries = _txn_entries(log)
    cps = _txn_checkpoints(log)
    if not entries:
        return False  # nothing new to compact
    head = max(s for s, _, _ in entries)
    if cps and cps[-1][0] >= head:
        return False  # already checkpointed at head
    # Everything below is pinned to `head`: a commit published after
    # this listing is NOT absorbed (its entry stays in the log).
    snap = txn_read(spark, table_dir, as_of=head)
    # Unique staging dir per compaction attempt: a racing compactor
    # at the same head must NOT overwrite a dir another attempt may
    # already have published (mode("overwrite") deletes first) — each
    # attempt owns its dir; visibility comes only from the manifest.
    import uuid

    cp_name = f"__checkpoint-{head:010d}-{uuid.uuid4().hex[:12]}"
    cp_dir = table / _TXN_DATA / cp_name
    out = snap.coalesce(n_files) if n_files else snap
    out.write.mode("overwrite").parquet(str(cp_dir))
    prev_ids, lo = ([], -1)
    if cps:
        lo = cps[-1][0]
        prev_ids = list(cps[-1][1]["txn_ids"])
    ids = prev_ids + [t for s, t, _ in entries if lo < s <= head]
    entry = {
        "seq": head,
        "data_dir": f"{_TXN_DATA}/{cp_name}",
        "txn_ids": ids,
        "n_txns": len(ids),
    }
    tmp = log / f".tmp-checkpoint-{head:010d}.json"
    tmp.write_text(json.dumps(entry))
    try:
        os.link(tmp, log / f"{head:010d}.checkpoint.json")
    except FileExistsError:
        import shutil

        tmp.unlink()
        shutil.rmtree(cp_dir, ignore_errors=True)  # loser's orphan dir
        return False  # a racing compaction already published head
    tmp.unlink()
    return True


def txn_vacuum(table_dir: str, keep_generations: int = 1) -> int:
    """Reclaim commits superseded by checkpoints. TWO-PHASE (r8):
    this call deletes only the doomed METADATA (older checkpoint
    manifests first, then log entries — at every crash point reads
    are correct or fail loudly); the now-unreferenced DATA DIRS are
    left in place and reclaimed by the orphan sweep of the NEXT
    vacuum call. The grace matters for concurrency: a reader that
    resolved a snapshot just before this vacuum may still be
    SCANNING the resolved dirs — deleting them here failed an
    in-flight count with a raw FileNotFound instead of the loud
    'vacuumed' contract error (caught by the boundary-read storm
    test). With the deferral, any NEW resolution of a reclaimed
    snapshot raises loudly at once (metadata gone), while an
    in-flight scan only breaks if a further full maintenance cycle
    completes before it finishes. Space cost: reclamation lags one
    vacuum call.

    ``keep_generations`` is the RETENTION discipline (Delta VACUUM's
    retention period, expressed in checkpoint generations instead of
    hours): with the default 1, reclamation stops at the
    SECOND-newest checkpoint.
    ``keep_generations=0`` reclaims through the newest checkpoint
    (maximal space, only safe with no concurrent readers of
    pre-checkpoint snapshots). Time travel below the reclaim boundary
    stops working and fails loudly. Replay of a vacuumed txn_id
    remains a no-op: checkpoint manifests carry the absorbed ids and
    txn_write consults them. Also sweeps ORPHANED dirs: compaction
    staging dirs whose manifest never published (crashed txn_compact),
    txn=<id> dirs whose entries a prior vacuum (crashed or two-phase)
    removed (absorbed in a checkpoint, no live entry), and checkpoint
    dirs whose manifest a prior vacuum removed —
    which is why maintenance (compact/vacuum) is SINGLE-MAINTAINER:
    a vacuum racing a live compact could reclaim its in-progress
    staging dir. Commits and reads stay fully
    concurrent. Returns the number of commits reclaimed."""
    import shutil
    from pathlib import Path

    table = Path(table_dir)
    log = table / _TXN_LOG
    cps = _txn_checkpoints(log)
    # Orphan sweep runs even when nothing is reclaimable: any
    # __checkpoint-* dir not referenced by a surviving manifest is a
    # crashed attempt's leftover (invisible to every reader). Also
    # reclaim txn=<id> dirs from a PRIOR vacuum that crashed between
    # its entry- and dir-deletion phases: their id is absorbed in a
    # surviving checkpoint but has no live log entry, so no snapshot
    # can ever list them again — without this they leak forever
    # (doomed is recomputed from surviving entries, which are gone).
    # Dirs with neither entry nor absorption are left alone: that is
    # an in-flight or crashed txn_write, and commits run concurrently
    # with vacuum.
    live_entries = _txn_entries(log)
    live_ids = {t for _, t, _ in live_entries}
    absorbed = set()
    for _, cp in cps:
        absorbed.update(cp["txn_ids"])
    referenced = {cp["data_dir"] for _, cp in cps}
    data = table / _TXN_DATA
    if data.is_dir():
        for d in data.iterdir():
            rel = f"{_TXN_DATA}/{d.name}"
            if d.name.startswith("__checkpoint-") and rel not in referenced:
                shutil.rmtree(d, ignore_errors=True)
            elif d.name.startswith("txn="):
                tid = d.name[len("txn="):]
                if tid in absorbed and tid not in live_ids:
                    shutil.rmtree(d, ignore_errors=True)
    if len(cps) <= keep_generations:
        return 0  # no checkpoint old enough to reclaim through
    boundary_idx = len(cps) - 1 - keep_generations
    cp_seq, _cp = cps[boundary_idx]
    doomed = [(s, t, p) for s, t, p in _txn_entries(log) if s <= cp_seq]
    # Deletion order = crash-safety order: (1) checkpoint manifests
    # STRICTLY OLDER than the boundary first — if entries vanished
    # while an older checkpoint manifest survived, txn_read could
    # resolve a stale as_of against it and silently miss the entries
    # between the two checkpoints; with the manifest gone the
    # contiguity check raises instead. Then (2) log entries. The
    # data dirs are NOT touched here (two-phase, see docstring):
    # they are now invisible to every new resolution and the next
    # vacuum's orphan sweep reclaims them, giving in-flight scans
    # one full maintenance cycle of grace.
    for s, old in cps[:boundary_idx]:
        (log / f"{s:010d}.checkpoint.json").unlink(missing_ok=True)
    for _, _, p in doomed:
        p.unlink(missing_ok=True)  # idempotent vs an overlapping vacuum
    return len(doomed)


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 8,
    bits: int = 16,
) -> None:
    """TWO-dimensional clustered layout via Z-order (Morton) keys —
    the multi-column complement of :func:`write_clustered` (whose
    lexicographic sort only prunes on the leading column): bucket
    each column to ``bits`` bits with width_bucket over its observed
    [min, max], interleave the bits into one Morton key, then
    range-distribute + sort on it. Files then cover compact RECTANGLES
    of (a, b) space, so parquet min/max stats prune point/range scans
    on EITHER column (or both) to a few files — the Delta/Iceberg
    OPTIMIZE ZORDER idea in one range shuffle, no global sort.

    Bucketing is uniform-width (one min/max agg probe, no quantile
    pass); heavily skewed columns should be pre-transformed (log,
    rank) or bucketed by sampled quantiles — same caveat as every
    Z-order implementation. Pruning quality is pinned by
    tests/test_sinks.py with pyarrow footer inspection against the
    1-D sorted layout."""
    a_min, a_max, b_min, b_max = df.agg(
        F.min(col_a), F.max(col_a), F.min(col_b), F.max(col_b)
    ).first()
    if a_min is None or b_min is None:
        # Empty input (or all-null cluster cols): nothing to order —
        # still materialize the (empty) table like plain parquet would.
        df.write.mode("overwrite").parquet(path)
        return
    n_buckets = 2**bits

    def bucket(c, lo, hi):
        # width_bucket is 1-based and sends x = hi to n+1; clamp into
        # [0, n_buckets) so the key stays within 2*bits bits.
        return F.least(
            F.lit(n_buckets - 1),
            F.greatest(
                F.lit(0),
                F.width_bucket(
                    F.col(c).cast("double"),
                    F.lit(float(lo)),
                    F.lit(float(hi)),
                    F.lit(n_buckets),
                )
                - 1,
            ),
        )

    ba = bucket(col_a, a_min, a_max)
    bb = bucket(col_b, b_min, b_max)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(ba, i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(bb, i).bitwiseAND(F.lit(1)), 2 * i)
        )
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
