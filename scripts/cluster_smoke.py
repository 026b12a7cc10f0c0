#!/usr/bin/env python3
"""Cluster-attach smoke: the batch CLI against a real `ray start --head`.

The north rule runs the job via ``ray job submit`` on a multi-node
cluster; this sandbox has no ``ray[default]`` (no HTTP job server, no
pip), so the smoke validates the part that is testable here and that
README claims: the CLI honors ``RAY_ADDRESS`` — the same invocation
attaches to a running cluster (``ray job submit``'s entrypoint does
exactly this: it sets RAY_ADDRESS and execs the command) or runs a
private local instance, with BYTE-IDENTICAL output either way.

Steps: start a head (8 cpus) -> try `ray job submit` (records whether
the job SDK is present) -> run `python -m pmocr_ray.cli --batch` once
attached (RAY_ADDRESS=<head>) and once local -> DuckDB hash over
(url, extracted_text, status) of both outputs -> print one JSON line.

Usage: python scripts/cluster_smoke.py [pages_dir]
"""
from __future__ import annotations

import glob
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, **kw):
    return subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                          **kw)


def main() -> int:
    if len(sys.argv) > 1:
        pages = sys.argv[1]
    else:
        # one sf0.001 fixture partition as the job input
        boot = sh([sys.executable, "-c",
                   "import ray;"
                   "ray.init(address='local', num_cpus=4,"
                   " include_dashboard=False, logging_level='ERROR');"
                   "from pmocr_ray.fixtures import ensure_pages_fixture;"
                   "print(ensure_pages_fixture('/root/testdata/sf0.001')[0]);"
                   "ray.shutdown()"])
        fixture_dir = boot.stdout.strip().splitlines()[-1]
        pages = tempfile.mkdtemp(prefix="cluster_smoke_pages_")
        src = sorted(glob.glob(os.path.join(fixture_dir, "*.parquet")))[0]
        shutil.copy(src, pages)

    out_root = tempfile.mkdtemp(prefix="cluster_smoke_out_")
    result = {"pages": pages}
    sh(["ray", "stop"])
    try:
        r = sh(["ray", "start", "--head", "--num-cpus=8", "--port=6379",
                "--disable-usage-stats"])
        if r.returncode != 0:
            result["error"] = "ray start --head failed: " + r.stderr[-300:]
            print(json.dumps(result))
            return 1

        # the real `ray job submit` path, if the job SDK exists here
        js = sh(["ray", "job", "submit", "--address",
                 "http://127.0.0.1:8265", "--working-dir", REPO, "--",
                 "python", "-m", "pmocr_ray.cli", "--batch", pages,
                 "--out", os.path.join(out_root, "job")], timeout=300)
        result["ray_job_submit"] = (
            "ok" if js.returncode == 0 else
            "unavailable (ray[default] job SDK not installed in this "
            "sandbox)" if "ray[default]" in (js.stderr + js.stdout) else
            f"failed rc={js.returncode}")

        env = dict(os.environ, RAY_ADDRESS="127.0.0.1:6379")
        a = sh([sys.executable, "-m", "pmocr_ray.cli", "--batch", pages,
                "--out", os.path.join(out_root, "cluster")], env=env)
        env = dict(os.environ, RAY_ADDRESS="local")
        b = sh([sys.executable, "-m", "pmocr_ray.cli", "--batch", pages,
                "--out", os.path.join(out_root, "local")], env=env)
        if a.returncode or b.returncode:
            result["error"] = (a.stderr + b.stderr)[-400:]
            print(json.dumps(result))
            return 1
        result["counts_cluster"] = json.loads(a.stdout.strip().splitlines()[-1])
        result["counts_local"] = json.loads(b.stdout.strip().splitlines()[-1])

        import duckdb

        q = ("SELECT count(*) n, md5(string_agg(url || '|' || "
             "coalesce(extracted_text,'') || '|' || status, chr(10) "
             "ORDER BY url)) h FROM read_parquet('{}/*.parquet')")
        ca = duckdb.sql(q.format(os.path.join(out_root, "cluster"))).fetchall()
        cb = duckdb.sql(q.format(os.path.join(out_root, "local"))).fetchall()
        result["rows"] = ca[0][0]
        result["hash_cluster"], result["hash_local"] = ca[0][1], cb[0][1]
        result["parity"] = ca == cb
        # compare against the job-submit output too, when it ran
        if result["ray_job_submit"] == "ok":
            cj = duckdb.sql(q.format(os.path.join(out_root, "job"))).fetchall()
            result["parity_job"] = cj == ca
        print(json.dumps(result))
        return 0 if result["parity"] else 1
    finally:
        sh(["ray", "stop"])


if __name__ == "__main__":
    sys.exit(main())
