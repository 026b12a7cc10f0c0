"""Lineage manifest + incremental/service-mode tests.

Reference parity: idempotent restart via filename-suffix state
(pmocr.sh:2126-2144), service mode processing only new arrivals
(pmocr.sh:2226-2281), atomic state flips (rename, pmocr.sh:2088-2096).
"""

import glob
import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from pmocr_ray.state.manifest import (
    LineageManifest,
    _partition_key,
    list_partitions,
    poll_once,
    run_incremental,
)


@pytest.fixture()
def tmp_env(tmp_path, pages_fixture):
    """Copy a few fixture partitions into a fresh monitored dir."""
    pages, done_manifest = pages_fixture
    src = sorted(glob.glob(os.path.join(pages, "*.parquet")))
    monitored = tmp_path / "incoming"
    monitored.mkdir()
    for f in src[:2]:
        shutil.copy(f, monitored / os.path.basename(f))
    return {
        "monitored": str(monitored),
        "out": str(tmp_path / "out"),
        "manifest": str(tmp_path / "manifest"),
        "done": done_manifest,
        "remaining": src[2:],
    }


def _output_urls(out_dir):
    urls = []
    for f in glob.glob(os.path.join(out_dir, "part-*", "*.parquet")):
        urls.extend(pq.read_table(f, columns=["url"])["url"].to_pylist())
    return urls


def test_incremental_processes_then_skips(tmp_env):
    s1 = run_incremental(tmp_env["monitored"], tmp_env["out"], tmp_env["manifest"],
                         tmp_env["done"])
    assert len(s1["processed"]) == 2 and not s1["skipped"]
    urls1 = _output_urls(tmp_env["out"])
    assert len(urls1) == len(set(urls1))  # exactly-once per url

    # second run: nothing new -> all skipped, output unchanged
    s2 = run_incremental(tmp_env["monitored"], tmp_env["out"], tmp_env["manifest"],
                         tmp_env["done"])
    assert not s2["processed"] and len(s2["skipped"]) == 2
    assert sorted(_output_urls(tmp_env["out"])) == sorted(urls1)


def test_new_partition_picked_up_by_poll(tmp_env):
    run_incremental(tmp_env["monitored"], tmp_env["out"], tmp_env["manifest"],
                    tmp_env["done"])
    # a new partition "arrives" (service-mode event)
    new = tmp_env["remaining"][0]
    shutil.copy(new, os.path.join(tmp_env["monitored"], os.path.basename(new)))
    s = poll_once(tmp_env["monitored"], tmp_env["out"], tmp_env["manifest"],
                  tmp_env["done"])
    assert len(s["processed"]) == 1 and len(s["skipped"]) == 2


def test_dirwatcher_push_events(tmp_path):
    """The ctypes inotify binding delivers created/renamed-in file
    names and times out cleanly (the reference's inotifywait contract,
    pmocr.sh:2268-2270)."""
    import threading
    import time as _t

    from pmocr_ray.state.inotify import DirWatcher, inotify_available

    if not inotify_available():  # pragma: no cover - non-Linux
        pytest.skip("platform lacks inotify")
    d = tmp_path / "watched"
    d.mkdir()
    with DirWatcher(str(d), suffix=".parquet") as w:
        assert w.wait(0.05) == []  # timeout -> forced-run wake

        def arrive():
            _t.sleep(0.1)
            (d / "ignored.tmp").write_bytes(b"x")   # filtered by suffix
            tmp = d / "part-0.parquet.tmp"
            tmp.write_bytes(b"x")
            os.replace(tmp, d / "part-0.parquet")   # rename-in (MOVED_TO)

        t = threading.Thread(target=arrive)
        t.start()
        events = w.wait(5.0)
        t.join()
        assert events == ["part-0.parquet"]


def test_serve_push_wakes_on_new_partition(tmp_env):
    """serve_push: first round immediate, second round woken by the
    partition file landing (push, not poll) — and the woken round
    processes exactly the new partition."""
    import threading
    import time as _t

    from pmocr_ray.state.inotify import inotify_available
    from pmocr_ray.state.manifest import serve_push

    new = tmp_env["remaining"][0]

    def arrive():
        _t.sleep(0.3)
        shutil.copy(new, os.path.join(tmp_env["monitored"],
                                      os.path.basename(new)))

    t = threading.Thread(target=arrive)
    t.start()
    # max_wait_s far above the arrival delay: only the push event can
    # wake round 2 quickly; the poller fallback (non-Linux) still
    # terminates via poll_interval_s
    summary = serve_push(tmp_env["monitored"], tmp_env["out"],
                         tmp_env["manifest"], tmp_env["done"],
                         max_wait_s=30.0, poll_interval_s=1.0,
                         max_rounds=2)
    t.join()
    assert summary["rounds"] == 2
    if inotify_available():
        assert summary["mode"] == "inotify"
        assert summary["last_events"] == [os.path.basename(new)]
    manifest = LineageManifest(tmp_env["manifest"])
    assert len(manifest.committed()) == 3  # 2 initial + the pushed one


def test_serve_multi_two_dirs_isolated_targets(tmp_path, pages_fixture):
    """One service process, two watched dirs with DIFFERENT target
    bundles (reference: one daemon, up to 5 monitor dirs with per-dir
    format lists, pmocr.sh:2519-2537 / default.conf:116-126): each dir
    gets its own manifest, output subtree and formats; manifests are
    isolated; a second round skips everything."""
    from pmocr_ray.state.manifest import ServiceDirSpec, serve_multi

    pages, done = pages_fixture
    src = sorted(glob.glob(os.path.join(pages, "*.parquet")))
    dirs, specs = [], []
    for i, targets in enumerate((("text", "csv"), ("text", "jsonl"))):
        d = tmp_path / f"incoming{i}"
        d.mkdir()
        shutil.copy(src[i], d / os.path.basename(src[i]))
        dirs.append(str(d))
        specs.append(ServiceDirSpec(
            pages_dir=str(d),
            out_dir=str(tmp_path / f"out{i}"),
            manifest_dir=str(tmp_path / f"manifest{i}"),
            done_manifest_path=done,
            targets=targets))

    summary = serve_multi(specs, push=False, max_rounds=1)
    assert summary["rounds"] == 1
    assert summary["per_dir"][dirs[0]]["partitions"] == 1
    assert summary["per_dir"][dirs[1]]["partitions"] == 1

    # per-dir target bundles landed (and ONLY those bundles)
    part0 = glob.glob(str(tmp_path / "out0" / "part-*"))
    part1 = glob.glob(str(tmp_path / "out1" / "part-*"))
    assert len(part0) == 1 and len(part1) == 1
    assert sorted(os.listdir(part0[0])) == ["csv", "text"]
    assert sorted(os.listdir(part1[0])) == ["jsonl", "text"]
    assert glob.glob(os.path.join(part0[0], "csv", "*.csv"))
    assert glob.glob(os.path.join(part1[0], "jsonl", "*.json"))

    # manifest isolation: each lineage records exactly its own partition
    m0 = LineageManifest(str(tmp_path / "manifest0")).committed()
    m1 = LineageManifest(str(tmp_path / "manifest1")).committed()
    assert len(m0) == 1 and len(m1) == 1
    assert {e["partition"] for e in m0.values()} == {os.path.basename(src[0])}
    assert {e["partition"] for e in m1.values()} == {os.path.basename(src[1])}

    # second round: snapshot diff finds nothing new in either dir
    summary2 = serve_multi(specs, push=False, max_rounds=1)
    assert summary2["per_dir"][dirs[0]]["partitions"] == 0
    assert summary2["per_dir"][dirs[1]]["partitions"] == 0

    # a shared manifest dir is refused loudly
    with pytest.raises(ValueError, match="shared"):
        serve_multi([specs[0],
                     ServiceDirSpec(pages_dir=dirs[1],
                                    out_dir=str(tmp_path / "oX"),
                                    manifest_dir=str(tmp_path / "manifest0"))],
                    push=False, max_rounds=1)


def test_service_alerting_on_poisoned_partition(tmp_env, tmp_path):
    """Service-mode alert parity (reference: SendAlert fires on every
    failed dispatch, pmocr.sh:428-480): with an alert hook wired into
    the service rounds, a poisoned partition quarantining mid-service
    must land a structured alert record in the JSONL sink AND a spool
    file via the file transport."""
    import json

    from pmocr_ray.runlog import file_transport, make_alert_hook

    def _boom_preprocessor(payload):
        raise RuntimeError("engine broken mid-service (alert drill)")

    spool = tmp_path / "alert_spool"
    alert_path = str(spool / "alerts.jsonl")
    hook = make_alert_hook(alert_path,
                           transport=file_transport(str(spool)))

    def records():
        if not os.path.exists(alert_path):
            return []
        with open(alert_path) as f:
            return [json.loads(line) for line in f if line.strip()]

    # round 1: healthy service round (fixture partitions may carry
    # their own failed-class rows — count whatever alerts they raise)
    s1 = poll_once(tmp_env["monitored"], tmp_env["out"], tmp_env["manifest"],
                   tmp_env["done"], on_complete=hook)
    n1 = len(records())
    assert n1 == (1 if s1["counts"].get("failed", 0) >= 1 else 0)

    # a 3-page partition arrives while the engine is poisoned
    src = pq.read_table(tmp_env["remaining"][0])
    drill_path = os.path.join(tmp_env["monitored"], "part-drill.parquet")
    pq.write_table(src.slice(0, 3), drill_path)
    s2 = poll_once(tmp_env["monitored"], tmp_env["out"], tmp_env["manifest"],
                   tmp_env["done"],
                   extract_kwargs={"preprocessors": [_boom_preprocessor]},
                   on_complete=hook)
    assert s2["counts"] == {"failed": 3}
    recs = records()
    assert len(recs) == n1 + 1
    last = recs[-1]
    assert last["alert"] == "run_completed_with_failures"
    assert last["failed_rows"] == 3
    assert last["partitions"] == [_partition_key(drill_path)]
    # the file transport spooled one file per alert record
    spool_files = glob.glob(str(spool / "alert-*.json"))
    assert len(spool_files) == len(recs)

    # an idle round (nothing new) must NOT alert
    s3 = poll_once(tmp_env["monitored"], tmp_env["out"], tmp_env["manifest"],
                   tmp_env["done"], on_complete=hook)
    assert not s3["processed"] and len(records()) == n1 + 1


def test_serve_multi_spec_alert_hook(tmp_path, pages_fixture):
    """ServiceDirSpec.alert_hook fires per round through serve_multi —
    the multi-dir daemon alerts exactly like the single-dir loops."""
    import json

    from pmocr_ray.runlog import make_alert_hook
    from pmocr_ray.state.manifest import ServiceDirSpec, serve_multi

    def _boom_preprocessor(payload):
        raise RuntimeError("engine broken (multi-dir alert drill)")

    pages, done = pages_fixture
    src = sorted(glob.glob(os.path.join(pages, "*.parquet")))
    d = tmp_path / "incoming"
    d.mkdir()
    pq.write_table(pq.read_table(src[0]).slice(0, 4),
                   str(d / "part-poison.parquet"))
    alert_path = str(tmp_path / "alerts.jsonl")
    spec = ServiceDirSpec(
        pages_dir=str(d), out_dir=str(tmp_path / "out"),
        manifest_dir=str(tmp_path / "manifest"),
        done_manifest_path=done,
        extract_kwargs={"preprocessors": [_boom_preprocessor]},
        alert_hook=make_alert_hook(alert_path))
    out = serve_multi([spec], push=False, max_rounds=1)
    assert out["per_dir"][str(d)]["counts"] == {"failed": 4}
    with open(alert_path) as f:
        recs = [json.loads(line) for line in f if line.strip()]
    assert len(recs) == 1 and recs[0]["failed_rows"] == 4


def test_serve_multi_shared_pages_dir_stats_not_merged(tmp_path,
                                                       pages_fixture):
    """Two specs watching the SAME pages dir (different out/manifest
    dirs — reachable via the CLI) must report SEPARATE per-dir stats,
    not silently merge counters under one pages_dir key (ADVICE r4)."""
    from pmocr_ray.state.manifest import ServiceDirSpec, serve_multi

    pages, done = pages_fixture
    src = sorted(glob.glob(os.path.join(pages, "*.parquet")))
    d = tmp_path / "incoming"
    d.mkdir()
    shutil.copy(src[0], d / os.path.basename(src[0]))
    specs = [ServiceDirSpec(pages_dir=str(d),
                            out_dir=str(tmp_path / f"out{i}"),
                            manifest_dir=str(tmp_path / f"manifest{i}"),
                            done_manifest_path=done,
                            targets=targets)
             for i, targets in enumerate((("text",), ("text", "csv")))]
    summary = serve_multi(specs, push=False, max_rounds=1)
    keys = sorted(summary["per_dir"])
    assert len(keys) == 2  # one entry per SPEC, not per pages_dir
    for k in keys:
        assert summary["per_dir"][k]["partitions"] == 1
    # both out subtrees materialized independently
    assert glob.glob(str(tmp_path / "out0" / "part-*"))
    assert glob.glob(str(tmp_path / "out1" / "part-*"))


def test_serve_multi_push_wakes_on_any_dir(tmp_path, pages_fixture):
    """Push mode over two dirs: round 2 is woken by a partition landing
    in the SECOND dir only (wait_any over both inotify fds)."""
    import threading
    import time as _t

    from pmocr_ray.state.inotify import inotify_available
    from pmocr_ray.state.manifest import ServiceDirSpec, serve_multi

    pages, done = pages_fixture
    src = sorted(glob.glob(os.path.join(pages, "*.parquet")))
    specs = []
    for i in range(2):
        d = tmp_path / f"incoming{i}"
        d.mkdir()
        specs.append(ServiceDirSpec(
            pages_dir=str(d), out_dir=str(tmp_path / f"out{i}"),
            manifest_dir=str(tmp_path / f"manifest{i}"),
            done_manifest_path=done))
    shutil.copy(src[0], tmp_path / "incoming0" / os.path.basename(src[0]))

    def arrive():
        _t.sleep(0.3)
        shutil.copy(src[1],
                    tmp_path / "incoming1" / os.path.basename(src[1]))

    t = threading.Thread(target=arrive)
    t.start()
    summary = serve_multi(specs, push=True, max_wait_s=30.0,
                          poll_interval_s=1.0, max_rounds=2)
    t.join()
    assert summary["rounds"] == 2
    if inotify_available():
        assert summary["mode"] == "inotify"
        assert summary["last_events"] == {
            str(tmp_path / "incoming1"): [os.path.basename(src[1])]}
    m1 = LineageManifest(str(tmp_path / "manifest1")).committed()
    assert {e["partition"] for e in m1.values()} == {os.path.basename(src[1])}


def test_torn_run_is_discarded_and_redone(tmp_env):
    """Kill-mid-run: a partition with output but no manifest commit is
    rerun from scratch; exactly-once per url still holds."""
    run_incremental(tmp_env["monitored"], tmp_env["out"], tmp_env["manifest"],
                    tmp_env["done"])
    parts = list_partitions(tmp_env["monitored"])
    key = _partition_key(parts[0])
    # simulate the crash: manifest entry lost, torn tmp dir left behind
    os.remove(os.path.join(tmp_env["manifest"], f"{key}.json"))
    os.makedirs(os.path.join(tmp_env["out"], f"part-{key}.tmp"), exist_ok=True)
    s = run_incremental(tmp_env["monitored"], tmp_env["out"], tmp_env["manifest"],
                        tmp_env["done"])
    assert s["processed"] == [key]
    urls = _output_urls(tmp_env["out"])
    assert len(urls) == len(set(urls))
    assert not os.path.exists(os.path.join(tmp_env["out"], f"part-{key}.tmp"))


def test_manifest_commit_atomic_and_counted(tmp_env):
    s = run_incremental(tmp_env["monitored"], tmp_env["out"], tmp_env["manifest"],
                        tmp_env["done"])
    m = LineageManifest(tmp_env["manifest"])
    entries = m.committed()
    assert len(entries) == 2
    for e in entries.values():
        assert e["num_rows"] == sum(e["counts"].values()) > 0
        assert set(e["counts"]) <= {
            "done", "failed", "skipped_existing_text", "skipped_suffix"}
        assert e["wall_s"] > 0 and e["rows_per_sec"] > 0
    assert not glob.glob(os.path.join(tmp_env["manifest"], "*.tmp"))
    # summary counts aggregate the per-partition counts
    total = {}
    for e in entries.values():
        for k, v in e["counts"].items():
            total[k] = total.get(k, 0) + v
    assert s["counts"] == total


def test_rename_as_you_go_cross_partition_skip(tmp_path, pages_fixture):
    """update_row_manifest: a url already processed in an earlier
    partition of the SAME run is skipped in later partitions (the
    reference renames files the moment they convert, so a duplicate
    arriving later is never reprocessed)."""
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from pmocr_ray import schema as S
    from pmocr_ray.state.manifest import run_incremental

    pages, _ = pages_fixture
    src = sorted(glob.glob(os.path.join(pages, "*.parquet")))[0]
    monitored = tmp_path / "in"
    monitored.mkdir()
    # partition A and an identical copy B (same urls, later name)
    shutil.copy(src, monitored / "a.parquet")
    shutil.copy(src, monitored / "b.parquet")
    done_path = str(tmp_path / "done.parquet")
    pq2.write_table(
        pa.Table.from_pydict(
            {"url": [], "status": [], "attempts": [],
             "processed_at": [], "run_id": []},
            schema=S.DONE_MANIFEST_SCHEMA),
        done_path)

    s = run_incremental(str(monitored), str(tmp_path / "out"),
                        str(tmp_path / "mani"), done_path,
                        update_row_manifest=True)
    assert len(s["processed"]) == 2
    n_rows = pq2.read_metadata(src).num_rows
    # partition B contributed only skipped_suffix rows
    assert s["counts"]["skipped_suffix"] >= n_rows


def test_update_done_manifest_round_trip(tmp_path, pages_fixture):
    """Mark-as-done semantics: after folding a run's output into the
    done manifest, a full rerun skips every terminal row (the
    reference's idempotent-restart property, pmocr.sh:2126-2144)."""
    from pmocr_ray.pipeline import run_extraction, status_counts, write_output
    from pmocr_ray.state.manifest import update_done_manifest

    pages, seed_manifest = pages_fixture
    out1 = str(tmp_path / "run1")
    write_output(run_extraction(pages, seed_manifest, run_id="r1"), out1)

    new_manifest = str(tmp_path / "done.parquet")
    import shutil

    shutil.copy(seed_manifest, new_manifest)
    n = update_done_manifest(out1, new_manifest, run_id="r1")
    # 400 seeded + 3000 done + 400 skipped_existing + 200 failed
    assert n == 4000

    counts = status_counts(run_extraction(pages, new_manifest, run_id="r2"))
    assert counts == {"skipped_suffix": 4000}  # nothing reprocessed

    # idempotent: folding the same output again changes nothing
    assert update_done_manifest(out1, new_manifest, run_id="r3") == 4000


def test_heartbeat_written(tmp_env):
    run_incremental(tmp_env["monitored"], tmp_env["out"], tmp_env["manifest"],
                    tmp_env["done"])
    hb = os.path.join(tmp_env["manifest"], "_heartbeat")
    assert os.path.exists(hb)
    float(open(hb).read())  # parseable timestamp


def test_alert_hook_fires_on_failures(tmp_env, tmp_path):
    """S9 alert sink: a run that quarantines rows appends a structured
    alert record; a clean rerun (all skipped) does not."""
    import json as _json

    from pmocr_ray.runlog import make_alert_hook

    alerts = str(tmp_path / "alerts.jsonl")
    sent = []
    hook = make_alert_hook(alerts, min_failed=1, transport=sent.append)

    s1 = run_incremental(tmp_env["monitored"], tmp_env["out"],
                         tmp_env["manifest"], tmp_env["done"],
                         on_complete=hook)
    assert s1["counts"]["failed"] > 0
    recs = [_json.loads(line) for line in open(alerts)]
    assert len(recs) == 1 == len(sent)
    assert recs[0]["failed_rows"] == s1["counts"]["failed"]
    assert recs[0]["alert"] == "run_completed_with_failures"

    # rerun: nothing processed -> counts empty -> no new alert
    run_incremental(tmp_env["monitored"], tmp_env["out"],
                    tmp_env["manifest"], tmp_env["done"], on_complete=hook)
    assert len(open(alerts).readlines()) == 1


def test_bloom_skip_matches_broadcast_path(ray_session, tmp_path):
    """run_extraction_bloom_skip: non-done rows byte-identical to the
    broadcast done-set path; done rows dropped (not skip-marked)."""
    from pmocr_ray.fixtures import ensure_pages_fixture
    from pmocr_ray.pipeline import run_extraction, run_extraction_bloom_skip

    pages, manifest = ensure_pages_fixture("/root/testdata/sf0.001")
    broadcast = {
        r["url"]: (r["status"], r["extracted_text"])
        for r in run_extraction(pages, manifest, run_id="x")
        .select_columns(["url", "status", "extracted_text"]).take_all()}
    bloom = {
        r["url"]: (r["status"], r["extracted_text"])
        for r in run_extraction_bloom_skip(pages, manifest, run_id="x")
        .select_columns(["url", "status", "extracted_text"]).take_all()}
    done_urls = {u for u, (s, _) in broadcast.items() if s == "skipped_suffix"}
    assert done_urls and done_urls.isdisjoint(bloom)  # dropped, not marked
    for u, v in bloom.items():
        assert broadcast[u] == v
    assert set(bloom) == set(broadcast) - done_urls


def test_service_mode_engine_failure_drill(tmp_env, tmp_path):
    """The reference's service-mode failure drill
    (/root/reference/dev/tests/run_tests.sh:409-427: break the engine
    mid-service, assert exactly 3 quarantined originals): round 1 is
    healthy; the engine is then poisoned (a raising preprocessor — the
    per-round engine config, like the reference's OCR_PREPROCESSOR) and
    a 3-page partition arrives; that round must quarantine EXACTLY
    those 3 rows, commit the partition with its failure counts, and
    leave every prior manifest entry untouched.  After the engine is
    fixed, the next round processes new arrivals normally and never
    reprocesses the quarantined partition."""
    # nested (not module-level) so Ray pickles it by value — worker
    # processes cannot import the tests module
    def _boom_preprocessor(payload):
        raise RuntimeError("engine broken mid-service (drill)")

    # round 1: healthy service round over the initial partitions
    s1 = poll_once(tmp_env["monitored"], tmp_env["out"], tmp_env["manifest"],
                   tmp_env["done"])
    assert len(s1["processed"]) == 2
    manifest = LineageManifest(tmp_env["manifest"])
    committed_before = manifest.committed()

    # a 3-page partition arrives while the engine is broken
    src = pq.read_table(tmp_env["remaining"][0])
    drill = src.slice(0, 3)
    drill_path = os.path.join(tmp_env["monitored"], "part-drill.parquet")
    pq.write_table(drill, drill_path)

    s2 = poll_once(tmp_env["monitored"], tmp_env["out"], tmp_env["manifest"],
                   tmp_env["done"],
                   extract_kwargs={"preprocessors": [_boom_preprocessor]})
    # exactly the 3 originals quarantined, nothing else touched
    assert s2["counts"] == {"failed": 3}
    assert len(s2["processed"]) == 1 and len(s2["skipped"]) == 2
    key = _partition_key(drill_path)
    entry = manifest.committed()[key]
    assert entry["counts"] == {"failed": 3} and entry["num_rows"] == 3
    for k, v in committed_before.items():  # prior entries byte-identical
        assert manifest.committed()[k] == v
    # the quarantined rows are real output rows with the engine error
    out_part = os.path.join(tmp_env["out"], f"part-{key}")
    rows = pq.read_table(glob.glob(os.path.join(out_part, "*.parquet"))[0])
    assert rows.num_rows == 3
    assert set(rows["status"].to_pylist()) == {"failed"}
    assert all("engine broken mid-service" in e
               for e in rows["error"].to_pylist())

    # engine fixed: the next round processes new arrivals normally and
    # does NOT reprocess the quarantined partition
    new = tmp_env["remaining"][1]
    shutil.copy(new, os.path.join(tmp_env["monitored"], os.path.basename(new)))
    s3 = poll_once(tmp_env["monitored"], tmp_env["out"], tmp_env["manifest"],
                   tmp_env["done"])
    assert len(s3["processed"]) == 1 and len(s3["skipped"]) == 3
    assert s3["counts"].get("done", 0) > 0
    assert manifest.committed()[key] == entry  # drill entry untouched
