"""Ray Data batch transforms — the physical stages of the pipeline.

Stage kinds mirror the reference's execution split (SURVEY §2.7/§4):

* cheap, pure, vectorizable steps (sniffing, projections, status
  predicates) are **stateless task** ``map_batches`` functions;
* the extraction engines are a **callable class** run as an actor pool
  (``map_batches(ExtractStage, concurrency=N)``) — registry/config
  resolved once per actor in ``__init__``, amortized across batches,
  mirroring the reference's long-lived OCR service processes
  (/root/reference/pmocr.sh:1825-1852 resolves the engine once at
  startup; pmocr-srv keeps it warm).

All stages are Arrow in / Arrow out (``batch_format="pyarrow"``,
zero-copy from the object store).
"""

from __future__ import annotations

import datetime

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from pmocr_ray import schema as S
from pmocr_ray.extract.registry import EXTRACTORS
from pmocr_ray.extract.sniff import sniff_batch
from pmocr_ray.state_machine import process_row


def sniff_stage(batch: pa.Table) -> pa.Table:
    """Append ``content_type`` + ``payload_bytes`` (cheap check before the
    heavy stage — reference hoists its pdffonts check the same way,
    /root/reference/CHANGELOG.md:15).

    ``payload_bytes`` feeds skew decisions (giant rows) downstream.
    """
    ct = sniff_batch(batch["html"])
    sizes = pc.binary_length(batch["html"]).cast(pa.int64())
    return batch.append_column("content_type", ct).append_column(
        "payload_bytes", sizes
    )


class ExtractStage:
    """Actor-pool extraction engine stage.

    One instance per actor; ``__init__`` resolves the extractor
    registry, materializes the broadcast done-url set (``ray.put`` once
    on the driver, ``ray.get`` once per actor — never re-shipped per
    batch), and pins the run metadata.  ``__call__`` runs each row of a
    batch through the shared state machine
    (:func:`pmocr_ray.state_machine.process_row`).

    Per-row Python here is the engine invocation itself (the reference
    execs one OCR process per file, /root/reference/pmocr.sh:1923-1963);
    everything around it — batching, routing, state columns — stays
    columnar.  A poisoned document quarantines a *row*, never the task
    (fault isolation, SURVEY §4).
    """

    def __init__(
        self,
        done_urls_ref=None,
        run_id: str = "run-0",
        processed_at: datetime.datetime | None = None,
        max_attempts: int = S.MAX_ATTEMPTS,
        check_existing_text: bool = True,
        max_payload_bytes: int | None = None,
        retry_attempts_ref=None,
        max_total_attempts: int = S.MAX_TOTAL_ATTEMPTS,
        preprocessors=None,
    ) -> None:
        import ray

        def _get(ref):
            return ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref

        self.done_urls = (frozenset(_get(done_urls_ref))
                          if done_urls_ref is not None else frozenset())
        # {url: prior_attempts} for quarantined urls being re-driven
        # (--retry-failed); broadcast once like the done set
        self.retry_attempts: dict = (dict(_get(retry_attempts_ref))
                                     if retry_attempts_ref is not None else {})
        self.extractors = dict(EXTRACTORS)  # resolved once per actor
        from pmocr_ray.extract.registry import resolve_preprocessors

        self.preprocessors = resolve_preprocessors(preprocessors) or None
        self.run_id = run_id
        self.processed_at = processed_at or S.EPOCH
        self.max_attempts = max_attempts
        self.max_total_attempts = max_total_attempts
        self.check_existing_text = check_existing_text
        self.max_payload_bytes = max_payload_bytes

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        urls = batch["url"].to_pylist()
        pre_texts = batch["text"].to_pylist()

        # Zero-copy payload access: slice each row's bytes as a
        # memoryview straight out of the Arrow data buffer (the batch is
        # plasma-shared-memory backed) — no per-row `bytes` copy of the
        # payload column.  The engine kernels accept bytes-like views;
        # decode/regex read directly from the buffer.
        html = batch["html"].combine_chunks()
        if pa.types.is_large_binary(html.type):  # pragma: no cover - 64-bit offsets
            offs = np.frombuffer(html.buffers()[1], dtype=np.int64,
                                 count=len(html) + 1, offset=html.offset * 8)
        else:
            offs = np.frombuffer(html.buffers()[1], dtype=np.int32,
                                 count=len(html) + 1, offset=html.offset * 4)
        data = (memoryview(html.buffers()[2])
                if html.buffers()[2] is not None else memoryview(b""))

        # content_type may already exist (an upstream sniff stage ran) —
        # reuse it so sniffing isn't paid twice; otherwise process_row
        # sniffs once in-row.
        have_ct = "content_type" in batch.column_names

        cts: list[str] = [None] * n  # type: ignore[list-item]
        statuses: list[str] = [None] * n  # type: ignore[list-item]
        attempts = [0] * n
        errors: list[str | None] = [None] * n
        extracted: list[str | None] = [None] * n

        pre_ct = batch["content_type"].to_pylist() if have_ct else None
        done = self.done_urls
        retry = self.retry_attempts
        for i in range(n):
            prior = retry.get(urls[i], 0) if retry else 0
            ct, status, att, err, text = process_row(
                data[offs[i]:offs[i + 1]],
                pre_texts[i],
                urls[i] in done,
                extractors=self.extractors,
                max_attempts=(self.max_total_attempts if prior
                              else self.max_attempts),
                check_existing_text=self.check_existing_text,
                max_payload_bytes=self.max_payload_bytes,
                content_type=pre_ct[i] if pre_ct is not None else None,
                prior_attempts=prior,
                preprocessors=self.preprocessors,
            )
            cts[i] = ct
            statuses[i] = status
            attempts[i] = att
            errors[i] = err
            extracted[i] = text

        return pa.Table.from_arrays(
            [
                batch["url"].combine_chunks()
                if isinstance(batch["url"], pa.ChunkedArray)
                else batch["url"],
                batch["warc_ts"].combine_chunks()
                if isinstance(batch["warc_ts"], pa.ChunkedArray)
                else batch["warc_ts"],
                batch["lang"].combine_chunks()
                if isinstance(batch["lang"], pa.ChunkedArray)
                else batch["lang"],
                pa.array(cts, pa.string()),
                pa.array(statuses, pa.string()),
                pa.array(attempts, pa.int32()),
                pa.array(errors, pa.string()),
                pa.array(extracted, pa.string()),
                pa.array([self.processed_at] * n, pa.timestamp("us")),
            ],
            schema=S.OUTPUT_SCHEMA,
        )


# Per-worker-process cache for task-mode extraction stages.  Ray worker
# processes persist across tasks, so a plain task `map_batches(fn)` with
# a module-level cache gets the same warm-engine amortization as an
# actor pool — and, when the read is not split (file count == requested
# blocks, batch_size=None), lets Ray fuse read→extract→write into ONE
# task operator so the payload column never leaves the read task (see
# run_extraction's mode docstring for the measured tradeoff).  Keyed by
# a token
# minted once per pipeline construction; bounded (a worker that serves
# many runs keeps only the most recent stages).
_TASK_STAGE_CACHE: dict = {}
_TASK_STAGE_CACHE_MAX = 4


def make_task_extract_fn(**ctor_kwargs):
    """Build a task-mode extract fn closing over the stage config.

    The closure (incl. broadcast ObjectRefs) ships to each worker once
    per task-spec; the ``ExtractStage`` itself — registry resolution,
    ``ray.get`` of the done-url broadcast — is constructed once per
    worker *process* and reused for every subsequent batch/task.
    """
    import uuid as _uuid

    token = _uuid.uuid4().hex

    def extract_fused(batch: pa.Table) -> pa.Table:
        st = _TASK_STAGE_CACHE.get(token)
        if st is None:
            if len(_TASK_STAGE_CACHE) >= _TASK_STAGE_CACHE_MAX:
                _TASK_STAGE_CACHE.pop(next(iter(_TASK_STAGE_CACHE)))
            st = ExtractStage(**ctor_kwargs)
            _TASK_STAGE_CACHE[token] = st
        return st(batch)

    return extract_fused


def csv_hack(batch: pa.Table, column: str = "extracted_text",
             out_column: str = "csv_text") -> pa.Table:
    """The reference's CSV hack as a vectorized kernel.

    ``sed 's/   */;/g'`` — 3+ consecutive spaces become one ``;`` to turn
    fixed-width engine output into CSV (/root/reference/pmocr.sh:2013-2043).
    """
    out = pc.replace_substring_regex(batch[column], pattern="   +", replacement=";")
    return batch.append_column(out_column, out)
