"""Thread hygiene of the guide-§2.6 overlapped driver jobs
(capital/io.overlapped_job): a failure in the caller's body must not
leave the background job running past the call (round-17, VERDICT r16
item 6 — the bare submit pattern leaked a running Spark job when a
gate stage raised between submit and result)."""

from __future__ import annotations

import threading
import time

import pytest

from capital.io import load_table, overlapped_job

SF = "/root/testdata/sf0.001"


def test_overlapped_job_success_path():
    with overlapped_job(lambda: 7) as fut:
        assert fut.result() == 7


def test_overlapped_job_joins_worker_on_failure():
    """If the body raises while the worker is mid-flight, the exit
    handler must join the worker before the exception escapes — the
    background work is observably COMPLETE outside the with block."""
    started, finished = threading.Event(), threading.Event()

    def slow():
        started.set()
        time.sleep(0.5)
        finished.set()
        return 42

    with pytest.raises(ValueError, match="body failed"):
        with overlapped_job(slow):
            assert started.wait(5)
            raise ValueError("body failed")
    assert finished.is_set()


def test_funnel_failure_leaves_no_background_job(spark, monkeypatch):
    """A mid-funnel failure in curation_v2_stages must not leak the
    overlapped benchmark-gram collect: by the time the exception
    reaches the caller, the gram worker has been joined."""
    import capital.llm.pipeline_v2 as p2

    started, finished = threading.Event(), threading.Event()

    def fake_gram_set(bench_raw, k):
        started.set()
        time.sleep(1.0)
        finished.set()
        return frozenset()

    def boom(*args, **kwargs):
        raise RuntimeError("mid-funnel failure")

    # bench_gram_set is imported inside curation_v2_stages from
    # capital.llm.assemble; gate_flags is a pipeline_v2 module global.
    monkeypatch.setattr(
        "capital.llm.assemble.bench_gram_set", fake_gram_set
    )
    monkeypatch.setattr(p2, "gate_flags", boom)

    docs = load_table(spark, SF, "documents")
    with pytest.raises(RuntimeError, match="mid-funnel failure"):
        p2.curation_v2_stages(docs)
    assert started.is_set()
    # Without the join, the raise propagates in microseconds while the
    # worker still sleeps — finished would be unset here.
    assert finished.is_set()
