"""Property-based tests: the state machine is total and deterministic.

The reference's resilience property — one poisoned document must never
crash a run, only quarantine itself (pmocr.sh:1981-2011) — expressed
as: ``process_row`` returns a valid state tuple for ARBITRARY bytes,
and is a pure function (same input → same output)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from pmocr_ray.state_machine import process_row

VALID_STATUSES = {"done", "failed", "skipped_existing_text", "skipped_suffix"}
VALID_CTS = {"html", "pdf", "unknown"}


@given(payload=st.binary(max_size=4096),
       pre_text=st.one_of(st.none(), st.text(max_size=64)),
       is_done=st.booleans())
@settings(max_examples=300, deadline=None)
def test_process_row_total(payload, pre_text, is_done):
    ct, status, attempts, error, text = process_row(payload, pre_text, is_done)
    assert ct in VALID_CTS
    assert status in VALID_STATUSES
    assert 0 <= attempts <= 2
    if status == "failed":
        assert error is not None and text is None
    if status == "done":
        assert error is None and isinstance(text, str)
    if is_done:
        assert status == "skipped_suffix"


@given(payload=st.binary(max_size=2048))
@settings(max_examples=100, deadline=None)
def test_process_row_deterministic(payload):
    assert process_row(payload, None, False) == process_row(payload, None, False)


@given(prefix=st.sampled_from([b"%PDF-1.4\n", b"<html>", b"  <div>", b"\x89PNG"]),
       tail=st.binary(max_size=2048))
@settings(max_examples=200, deadline=None)
def test_sniffed_types_route_without_crash(prefix, tail):
    ct, status, attempts, error, text = process_row(prefix + tail, None, False)
    if prefix.startswith(b"%PDF-"):
        assert ct == "pdf"
    elif prefix.lstrip().startswith(b"<"):
        assert ct == "html"
    else:
        assert ct == "unknown" and status == "failed"
