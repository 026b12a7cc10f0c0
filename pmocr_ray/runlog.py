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
