"""Smoke tests for the runnable walkthroughs in examples/ — each runs in
its own subprocess (own SparkSession, own loopback server where needed)
and must exit 0 with its expected output marker, so the documented
entry points cannot rot."""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str, timeout: int = 240) -> str:
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script)],
        capture_output=True,
        text=True,
        timeout=timeout,
        cwd=REPO,
    )
    assert proc.returncode == 0, f"{script} failed:\n{proc.stderr[-2000:]}"
    return proc.stdout


@pytest.mark.parametrize(
    ("script", "marker"),
    [
        ("simple_query.py", "banana"),  # the golden triple rendered
        ("batch_analytics.py", "count_order"),  # Q1 header
        ("corpus_curation.py", "survivors:"),  # collapse stage ran
        ("headers_tracing.py", "trace=req-2"),  # durable header replay
        ("multimodal_png.py", "decoded 5 real PNGs"),  # stdlib PNG decode
        ("ann_index_probe.py", "partition pruning"),  # persisted-index probe
        ("streaming_ann_screen.py", "index accumulates"),  # streaming screen
        ("retrieval_stack.py", "quality screen kept"),  # retrieval + model
        ("text_index_lifecycle.py", "v1 still on disk: True"),  # BM25 index
    ],
)
def test_example_runs_clean(script, marker):
    out = _run(script)
    assert marker in out, f"{script} output missing {marker!r}:\n{out[-2000:]}"
