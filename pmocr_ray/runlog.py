"""Leveled run logger — the reference's log sink, minus the bash.

Reference: ``_Logger``/``Logger`` write leveled, timestamped lines to a
log file and stdout/stderr, with per-PID temp logs harvested at exit
(/root/reference/pmocr.sh:147-302).  Here: stdlib ``logging`` with a
per-run file handler beside the lineage manifest; Ray already aggregates
per-task worker logs, so only driver-side run events are logged here.
Per-partition metrics land in the manifest entries (the structured
replacement for log-scraping).
"""

from __future__ import annotations

import logging
import os

_FMT = "%(asctime)s %(levelname)s [%(name)s] %(message)s"


def make_alert_hook(alert_path: str, *, min_failed: int = 1,
                    transport=None):
    """Failure-alert sink for ``run_incremental(on_complete=...)``.

    Reference: ``SendAlert``/``SendEmail`` fire when a run ends with
    errors (/root/reference/pmocr.sh:428-480,497-673 — mail transports
    are deployment-specific and out of engine scope per SURVEY §2 S9).
    The engine-side contract is this hook: when a completed run counts
    ``>= min_failed`` failed rows, a structured JSON alert record is
    appended to ``alert_path`` (the integration point any transport
    tails), and ``transport(record)`` is invoked if given (e.g. an SMTP
    callable in a real deployment).  Returns the callback.
    """
    import json as _json

    def hook(summary: dict) -> None:
        failed = summary.get("counts", {}).get("failed", 0)
        if failed < min_failed:
            return
        record = {
            "alert": "run_completed_with_failures",
            "failed_rows": failed,
            "counts": summary.get("counts", {}),
            "partitions": summary.get("processed", []),
        }
        os.makedirs(os.path.dirname(alert_path) or ".", exist_ok=True)
        with open(alert_path, "a") as f:
            f.write(_json.dumps(record, sort_keys=True) + "\n")
        if transport is not None:
            transport(record)

    return hook


def get_run_logger(run_id: str, log_dir: str | None = None) -> logging.Logger:
    logger = logging.getLogger(f"pmocr_ray.{run_id}")
    if logger.handlers:  # already configured for this run
        return logger
    logger.setLevel(logging.INFO)
    logger.propagate = False
    sh = logging.StreamHandler()
    sh.setFormatter(logging.Formatter(_FMT))
    logger.addHandler(sh)
    if log_dir:
        os.makedirs(log_dir, exist_ok=True)
        fh = logging.FileHandler(os.path.join(log_dir, f"{run_id}.log"))
        fh.setFormatter(logging.Formatter(_FMT))
        logger.addHandler(fh)
    return logger
