"""Per-partition lineage manifest + incremental (service-mode) driver.

The reference keeps all cross-run state in the filesystem: renamed
files are the done/failed sets (/root/reference/pmocr.sh:2126-2144),
an event-log file is the change feed (pmocr.sh:1640,2183), a heartbeat
file is liveness (pmocr.sh:2446,2503).  Here the same roles are played
by a **lineage manifest**: one small JSON entry per input partition,
committed atomically (write tmp → rename) after that partition's
output parquet is atomically in place.

Resume semantics (idempotent restart, the reference's core property):
a rerun processes exactly the partitions without a committed manifest
entry; a partition killed mid-run left only a ``.tmp`` output dir,
which is discarded and rewritten.  Output is therefore exactly-once
per url across crashes/restarts.

Service mode (pmocr.sh:2226-2281 — inotify / poller + debounced
dispatch) becomes :func:`poll_once`: snapshot-diff the partition
listing against the manifest, process what's new.  A loop around it
with an interval is the poller (`_InotifyWaitPoller`,
pmocr.sh:1567-1670); bursts coalesce for free because each round
processes *all* pending partitions (DispatchRunner's DISPATCH_NEEDED
cap, pmocr.sh:2195-2224).

Scale note: at 10^12 documents this manifest is metadata-only — one
entry per multi-GB partition, listed and diffed on the driver without
touching row data.  Row-level done-sets are only consulted for
partitions not yet committed (see pipeline.py).
"""

from __future__ import annotations

import dataclasses
import datetime
import glob
import hashlib
import json
import os
import shutil
import time

import pyarrow.parquet as pq


def _partition_key(path: str) -> str:
    return hashlib.md5(os.path.basename(path).encode()).hexdigest()[:16]


class LineageManifest:
    """Directory of per-partition commit records with atomic writes."""

    def __init__(self, manifest_dir: str) -> None:
        self.dir = manifest_dir
        os.makedirs(manifest_dir, exist_ok=True)

    def _path(self, key: str) -> str:
        return os.path.join(self.dir, f"{key}.json")

    def is_committed(self, key: str) -> bool:
        return os.path.exists(self._path(key))

    def committed(self) -> dict[str, dict]:
        out = {}
        for p in sorted(glob.glob(os.path.join(self.dir, "*.json"))):
            with open(p) as f:
                entry = json.load(f)
            out[os.path.splitext(os.path.basename(p))[0]] = entry
        return out

    def commit(self, key: str, entry: dict) -> None:
        """Atomic: tmp write + rename — a crash never leaves a partial
        entry (the reference's rename-based state flips are atomic the
        same way, pmocr.sh:2088-2096)."""
        tmp = self._path(key) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(entry, f, sort_keys=True)
        os.replace(tmp, self._path(key))

    def heartbeat(self) -> None:
        """Liveness stamp (reference: SERVICE_MONITOR_FILE refresh,
        pmocr.sh:2279)."""
        with open(os.path.join(self.dir, "_heartbeat"), "w") as f:
            f.write(str(time.time()))


def list_partitions(pages_dir: str) -> list[str]:
    return sorted(glob.glob(os.path.join(pages_dir, "*.parquet")))


def run_incremental(
    pages_dir: str,
    out_dir: str,
    manifest_dir: str,
    done_manifest_path: str | None = None,
    *,
    run_id: str | None = None,
    batch_size: int = 256,
    concurrency: int | None = None,
    on_complete=None,
    update_row_manifest: bool = False,
    extract_kwargs: dict | None = None,
    targets: tuple[str, ...] | list[str] | None = None,
) -> dict:
    """Process every input partition lacking a committed lineage entry.

    Each partition runs as its own (cluster-parallel) Dataset pipeline,
    writes ``out_dir/part-<key>/`` atomically, then commits its
    manifest entry with per-status counts.  Returns a summary dict.

    ``update_row_manifest=True`` additionally folds each committed
    partition's terminal rows into ``done_manifest_path`` as it goes —
    the reference's rename-as-you-process behavior (a file is renamed
    ``_OCR`` the moment its conversion lands, pmocr.sh:2088-2096), so a
    url appearing in a *later* partition of the same run is skipped.
    Requires ``done_manifest_path``.

    ``extract_kwargs`` forwards engine configuration (preprocessors,
    retry policy, batch sizing overrides …) to ``run_extraction`` —
    the reference re-reads its engine config each service round
    (SetOCREngineOptions at startup of each dispatch), so a config
    change (or a broken engine) takes effect at the next poll, never
    mid-partition.  A failing engine quarantines rows; the partition
    still commits with its failure counts (fault isolation, SURVEY §4).

    ``targets`` selects a multi-format bundle per partition (the
    reference's per-monitor-dir format list, default.conf:116-126):
    each committed partition directory then holds ``text/`` plus one
    subdir per derived format (see :func:`pmocr_ray.targets
    .write_targets`); lineage counts and the done-manifest fold read
    the canonical ``text/`` output.
    """
    from pmocr_ray.pipeline import run_extraction  # local import: no ray at module load

    manifest = LineageManifest(manifest_dir)
    manifest.heartbeat()
    run_id = run_id or f"run-{int(time.time())}"
    from pmocr_ray.runlog import get_run_logger

    log = get_run_logger(run_id, log_dir=manifest_dir)
    summary = {"processed": [], "skipped": [], "counts": {}}

    for path in list_partitions(pages_dir):
        key = _partition_key(path)
        if manifest.is_committed(key):
            summary["skipped"].append(key)
            continue
        part_out = os.path.join(out_dir, f"part-{key}")
        tmp_out = part_out + ".tmp"
        shutil.rmtree(tmp_out, ignore_errors=True)   # discard a torn run
        shutil.rmtree(part_out, ignore_errors=True)

        t0 = time.perf_counter()
        ds = run_extraction(
            path,
            done_manifest_path,
            run_id=run_id,
            batch_size=batch_size,
            concurrency=concurrency,
            **(extract_kwargs or {}),
        )
        if targets:
            from pmocr_ray.targets import write_targets

            write_targets(ds, tmp_out, targets)
        else:
            ds.write_parquet(tmp_out)
        os.replace(tmp_out, part_out)
        # the canonical text output (counts + done-manifest fold read it)
        status_root = os.path.join(part_out, "text") if targets else part_out
        wall_s = round(time.perf_counter() - t0, 3)

        # per-partition metrics from the written output (columnar read
        # of one small column, not a second pipeline run; vectorized)
        import pyarrow.compute as _pc

        counts: dict[str, int] = {}
        for f in glob.glob(os.path.join(status_root, "*.parquet")):
            for s in _pc.value_counts(
                    pq.read_table(f, columns=["status"])["status"]).to_pylist():
                counts[s["values"]] = counts.get(s["values"], 0) + s["counts"]
        entry = {
            "partition": os.path.basename(path),
            "key": key,
            "run_id": run_id,
            "completed_at": datetime.datetime.now(datetime.timezone.utc).isoformat(),
            "num_rows": sum(counts.values()),
            "counts": counts,
            # per-partition throughput metrics (north-rule "lineage +
            # metrics"): wall time covers extract + write of this
            # partition's own pipeline run
            "wall_s": wall_s,
            "rows_per_sec": round(sum(counts.values()) / wall_s, 1)
            if wall_s > 0 else 0.0,
        }
        # Fold the partition's terminal rows into the done manifest
        # BEFORE committing its lineage entry: a crash between the two
        # leaves an uncommitted partition that a rerun reprocesses, and
        # the fold's idempotent shard union absorbs the rerun — the
        # reverse order could commit a partition whose urls were never
        # recorded (exactly-once-per-url would then be violated by a
        # duplicate url in a later partition).
        if update_row_manifest and done_manifest_path:
            update_done_manifest(status_root, done_manifest_path,
                                 run_id=run_id)
        manifest.commit(key, entry)
        manifest.heartbeat()
        log.info("partition %s committed: %s", key, counts)
        summary["processed"].append(key)
        for s, c in counts.items():
            summary["counts"][s] = summary["counts"].get(s, 0) + c
    if on_complete is not None:
        # Alert hook (reference: SendAlert on run outcome,
        # /root/reference/pmocr.sh:428-480) — driver-side callback, not
        # a dataflow operator.
        on_complete(summary)
    return summary


def _read_terminal_rows(output_path: str):
    """Columnar read of a run output's terminal rows (url, status,
    processed_at) — handles a single file, a flat/nested directory, and
    hive ``status=<v>/`` partitioned layouts (the partition column is
    materialized by ``pyarrow.dataset`` with hive inference)."""
    import pyarrow.dataset as pads

    from pmocr_ray import schema as S

    dset = pads.dataset(output_path, format="parquet",
                        partitioning="hive")
    cols = ["url", "status", "attempts", "processed_at"]
    flt = pads.field("status").isin(
        [S.STATUS_DONE, S.STATUS_FAILED, S.STATUS_SKIPPED_TEXT])
    t = dset.to_table(columns=cols, filter=flt)
    # hive partition columns materialize as dictionary — decode for a
    # stable manifest schema
    if hasattr(t["status"].type, "value_type"):
        import pyarrow as pa

        t = t.set_column(t.column_names.index("status"), "status",
                         t["status"].cast(pa.string()))
    return t


def _manifest_shard_files(done_manifest_path: str) -> list[str]:
    if os.path.isdir(done_manifest_path):
        return sorted(glob.glob(os.path.join(done_manifest_path, "*.parquet")))
    if os.path.exists(done_manifest_path):
        return [done_manifest_path]
    return []


def load_retry_state(done_manifest_path: str | None,
                     max_total_attempts: int) -> tuple[frozenset, dict]:
    """Split the done manifest for a ``--retry-failed`` run.

    Returns ``(skip_urls, retry_attempts)``:

    * ``skip_urls`` — urls never re-driven: any non-failed terminal
      record, or failed with the lifetime attempt budget exhausted
      (the reference stops postponing after ``maxPostponeRetries``,
      /root/reference/pmocr.sh:814-818).
    * ``retry_attempts`` — ``{url: prior_attempts}`` for quarantined
      urls still under budget; the pipeline re-drives them with the
      counter carried forward.

    Shards written before the ``attempts`` column existed default to 1
    (one full prior run).  A url recorded in several shards (e.g. a
    retry run folded beside the original) takes the max attempts and
    any non-failed status wins.
    """
    from pmocr_ray import schema as S

    skip: set = set()
    failed_attempts: dict = {}
    for f in _manifest_shard_files(done_manifest_path or ""):
        t = pq.read_table(f)
        urls = t["url"].to_pylist()
        statuses = t["status"].to_pylist()
        attempts = (t["attempts"].to_pylist() if "attempts" in t.column_names
                    else [1] * t.num_rows)
        for u, s, a in zip(urls, statuses, attempts):
            if s == S.STATUS_FAILED:
                failed_attempts[u] = max(failed_attempts.get(u, 0), a or 1)
            else:
                skip.add(u)
    retry = {}
    for u, a in failed_attempts.items():
        if u in skip:
            continue
        if a >= max_total_attempts:
            skip.add(u)
        else:
            retry[u] = a
    return frozenset(skip), retry


def update_done_manifest(output_path: str, done_manifest_path: str,
                         run_id: str = "update") -> int:
    """Fold a run's output into the row-level done manifest — the
    reference's mark-as-done/mark-as-failed renames (``_OCR`` /
    ``_OCR_ERR`` suffixes, /root/reference/pmocr.sh:2088-2096,
    1999-2011): every row that reached a terminal state (done, failed,
    skipped_existing_text) is recorded so future batch runs skip it
    (both suffixes are excluded from future discovery in the reference,
    pmocr.sh:2126-2144).

    **Sharded**: the manifest is a *directory* of parquet shards; each
    fold appends/overwrites exactly one shard named deterministically
    from ``output_path`` — commit cost is O(partition), independent of
    manifest history (the reference's per-file rename is O(1) the same
    way).  History is never rewritten.  Idempotent: re-folding the same
    output unions with its own previous shard (monotone — a rerun whose
    rows all skip cannot erase earlier records).  Atomic per shard
    (tmp + rename).  A legacy single-file manifest at this path is
    migrated into a directory in place.

    Returns the distinct-url count across the manifest (reporting only
    — reads one column; the commit itself never touches other shards).
    """
    import hashlib as _hl

    import pyarrow as pa
    import pyarrow.compute as pc

    from pmocr_ray import schema as S

    # -- legacy migration: single parquet file -> directory of shards
    if os.path.isfile(done_manifest_path):
        tmp_dir = done_manifest_path + ".migrate.tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir)
        os.replace(done_manifest_path, os.path.join(tmp_dir, "seed.parquet"))
        os.replace(tmp_dir, done_manifest_path)
    os.makedirs(done_manifest_path, exist_ok=True)

    shard_key = _hl.md5(os.path.abspath(output_path).encode()).hexdigest()[:16]
    shard_path = os.path.join(done_manifest_path, f"shard-{shard_key}.parquet")

    t = _read_terminal_rows(output_path)
    table = pa.Table.from_pydict(
        {
            "url": t["url"].cast(pa.string()),
            "status": t["status"],
            "attempts": t["attempts"].cast(pa.int32()),
            "processed_at": t["processed_at"],
            "run_id": pa.array([run_id] * t.num_rows, pa.string()),
        },
        schema=S.DONE_MANIFEST_SCHEMA,
    )
    if os.path.exists(shard_path):
        # union with this shard's own previous content (monotone): a
        # crash-rerun that skipped every row must not erase the record
        prev = pq.read_table(shard_path)
        if "attempts" not in prev.column_names:  # pre-attempts shard
            prev = prev.add_column(
                2, S.DONE_MANIFEST_SCHEMA.field("attempts"),
                pa.array([1] * prev.num_rows, pa.int32()))
        mask = pc.invert(pc.is_in(prev["url"], value_set=table["url"]))
        table = pa.concat_tables([table, prev.filter(mask)])
    table = table.sort_by("url")
    tmp = shard_path + ".tmp"
    pq.write_table(table, tmp)
    os.replace(tmp, shard_path)

    distinct: set = set()
    for f in _manifest_shard_files(done_manifest_path):
        distinct.update(pq.read_table(f, columns=["url"])["url"].to_pylist())
    return len(distinct)


def poll_once(pages_dir: str, out_dir: str, manifest_dir: str,
              done_manifest_path: str | None = None,
              extract_kwargs: dict | None = None,
              on_complete=None) -> dict:
    """One service-mode round: diff listing vs manifest, process the new.

    Equivalent of one wake of the reference's watcher → DispatchRunner
    chain (pmocr.sh:2268-2277 → 2195-2224).  ``extract_kwargs`` is the
    per-round engine configuration (see :func:`run_incremental`);
    ``on_complete`` is the per-round alert hook (the reference alerts
    on every failed dispatch, pmocr.sh:428-480 — see
    :func:`pmocr_ray.runlog.make_alert_hook`)."""
    return run_incremental(pages_dir, out_dir, manifest_dir,
                           done_manifest_path, extract_kwargs=extract_kwargs,
                           on_complete=on_complete)


def serve(pages_dir: str, out_dir: str, manifest_dir: str,
          done_manifest_path: str | None = None,
          interval_s: float = 30.0, max_rounds: int | None = None,
          on_complete=None) -> None:
    """Poller service loop (reference: INOTIFY_POLLER_INTERVAL=30,
    /root/reference/default.conf:33; forced-run period pmocr.sh:24-26).
    ``max_rounds`` bounds the loop for tests; ``on_complete`` fires
    per round (alert hook)."""
    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        poll_once(pages_dir, out_dir, manifest_dir, done_manifest_path,
                  on_complete=on_complete)
        rounds += 1
        if max_rounds is None or rounds < max_rounds:
            time.sleep(interval_s)


def serve_push(pages_dir: str, out_dir: str, manifest_dir: str,
               done_manifest_path: str | None = None,
               max_wait_s: float = 86400.0,
               poll_interval_s: float = 30.0,
               max_rounds: int | None = None,
               extract_kwargs: dict | None = None,
               on_complete=None) -> dict:
    """Push-based service loop: block on **inotify** events for
    ``pages_dir`` between rounds, waking the instant a new partition
    file lands — the reference's primary service mode (``inotifywait -e
    create -e moved_to --timeout $MAX_WAIT``, pmocr.sh:2268-2270) —
    with ``max_wait_s`` forcing a periodic round regardless
    (``MAX_WAIT``, pmocr.sh:24-26).

    Events are only the wake signal; every round is the same manifest
    snapshot-diff (:func:`poll_once`), so overflowed/dropped events
    cost latency, never correctness.  On platforms without inotify the
    loop degrades to :func:`serve`'s fixed-interval poller (the
    reference's ``_InotifyWaitPoller`` fallback, pmocr.sh:2272-2275).

    The first round runs immediately (the reference's first-run kick,
    pmocr.sh:2262-2265).  ``max_rounds`` bounds the loop for tests.
    Returns a summary: rounds run, mode, last wake's event names.
    """
    from pmocr_ray.state.inotify import DirWatcher

    watcher = None
    try:
        watcher = DirWatcher(pages_dir, suffix=".parquet")
    except OSError:
        pass  # degrade to the poller below

    rounds, last_events = 0, []
    try:
        while max_rounds is None or rounds < max_rounds:
            poll_once(pages_dir, out_dir, manifest_dir, done_manifest_path,
                      extract_kwargs=extract_kwargs,
                      on_complete=on_complete)
            rounds += 1
            if max_rounds is not None and rounds >= max_rounds:
                break
            if watcher is not None:
                last_events = watcher.wait(max_wait_s)
            else:
                time.sleep(poll_interval_s)
    finally:
        if watcher is not None:
            watcher.close()
    return {"rounds": rounds,
            "mode": "inotify" if watcher is not None else "poller",
            "last_events": last_events}


@dataclasses.dataclass(frozen=True)
class ServiceDirSpec:
    """One watched directory of a multi-directory service process —
    the analogue of the reference's per-monitor-dir config bundle
    (MONITOR_DIR_1..5 + per-dir format lists, default.conf:116-126):
    its own pages source, output root, lineage manifest, optional done
    manifest and target-format bundle, fully isolated from the other
    directories the same process watches."""

    pages_dir: str
    out_dir: str
    manifest_dir: str
    done_manifest_path: str | None = None
    targets: tuple[str, ...] | None = None
    extract_kwargs: dict | None = None
    # per-round alert hook (reference: SendAlert on every failed
    # dispatch, pmocr.sh:428-480) — see runlog.make_alert_hook;
    # process-local callable, fired after each round that this spec
    # processed at least one partition in
    alert_hook: "object | None" = None


def serve_multi(specs, *, push: bool = True, max_wait_s: float = 86400.0,
                poll_interval_s: float = 30.0,
                max_rounds: int | None = None) -> dict:
    """One service process watching N directories — the reference
    daemon spawns up to 5 per-dir monitors inside one process
    (pmocr.sh:2519-2537); this is the same shape for partitioned
    Parquet: one round = a manifest snapshot-diff poll of EVERY spec
    (each with its own manifest/out/targets — isolation is per spec),
    then one blocking :func:`pmocr_ray.state.inotify.wait_any` across
    all the dirs' inotify fds (``push=True``), so a partition landing
    in any one directory wakes the whole loop.  Degrades to the
    fixed-interval poller where inotify is unavailable.  As in the
    single-dir loops, events are only the wake signal — correctness
    comes from the per-round snapshot diff.

    ``max_rounds`` bounds the loop for tests.  Returns a summary with
    per-directory processed/partition counts.
    """
    from pmocr_ray.state.inotify import DirWatcher, wait_any

    specs = list(specs)
    if not specs:
        raise ValueError("serve_multi: no directory specs given")
    seen: dict[str, str] = {}
    for s in specs:
        key = os.path.abspath(s.manifest_dir)
        if key in seen:
            raise ValueError(
                f"serve_multi: manifest dir {s.manifest_dir!r} is shared "
                f"by {seen[key]!r} and {s.pages_dir!r} — two watched "
                "directories would interleave lineage; give each spec "
                "its own manifest_dir")
        seen[key] = s.pages_dir

    watchers: list = []
    if push:
        try:
            for s in specs:
                watchers.append(DirWatcher(s.pages_dir, suffix=".parquet"))
        except OSError:
            for w in watchers:
                w.close()
            watchers = []  # degrade every dir to the poller together

    rounds = 0
    last_events: dict = {}
    # Stats are keyed by pages_dir when it is unique among the specs
    # (the common case and the shape the CLI summary expects); two
    # specs legitimately watching the SAME pages_dir with different
    # targets/out dirs get distinct "pages -> out" keys instead of
    # silently merging their counters.
    _pd_n: dict[str, int] = {}
    for s in specs:
        _pd_n[s.pages_dir] = _pd_n.get(s.pages_dir, 0) + 1

    def _dir_key(s) -> str:
        if _pd_n[s.pages_dir] == 1:
            return s.pages_dir
        return f"{s.pages_dir} -> {s.out_dir}"

    per_dir: dict[str, dict] = {
        _dir_key(s): {"partitions": 0, "counts": {}} for s in specs}
    try:
        while max_rounds is None or rounds < max_rounds:
            for s in specs:
                out = run_incremental(
                    s.pages_dir, s.out_dir, s.manifest_dir,
                    s.done_manifest_path,
                    extract_kwargs=s.extract_kwargs,
                    targets=s.targets,
                    on_complete=s.alert_hook)
                d = per_dir[_dir_key(s)]
                d["partitions"] += len(out["processed"])
                for k, v in out["counts"].items():
                    d["counts"][k] = d["counts"].get(k, 0) + v
            rounds += 1
            if max_rounds is not None and rounds >= max_rounds:
                break
            if watchers:
                last_events = wait_any(watchers, max_wait_s)
            else:
                time.sleep(poll_interval_s)
    finally:
        for w in watchers:
            w.close()
    return {"rounds": rounds,
            "mode": "inotify" if watchers else "poller",
            "last_events": last_events,
            "per_dir": per_dir}
