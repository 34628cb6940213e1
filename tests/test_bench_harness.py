"""End-to-end bench-harness contract, run as a real subprocess.

Two production failure modes are pinned here:

1. Exit path (rounds 5 and 7 post-mortems): StateStore maintenance /
   session-teardown WARN chatter used to land AFTER the metric line,
   and the driver — which keeps only a ~2 KB stdout tail — parsed the
   artifact as null. The bench now stops all streams and the session
   BEFORE printing, then os._exit(0)s; this test runs a 2-query bench
   that INCLUDES a streaming query and asserts the captured stdout's
   LAST line json-parses to the metric object.

2. Per-query storage hygiene (rounds 7/8 post-mortems): persisted /
   localCheckpoint'd RDDs accumulated across the ~190-query loop and
   made rotating victims time 2-15x their isolated cost. The loop now
   releases executor state (clearCache + unpersist of every
   persistent RDD) at each query boundary and asserts the
   persistent-RDD map is empty; the in-process test below drives
   release_executor_state() against a deliberately persisted +
   localCheckpoint'd frame.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO_ROOT))

import bench  # noqa: E402

from tests.span_contract import assert_spans_match_runs  # noqa: E402


def test_bench_subprocess_last_stdout_line_is_the_metric(tmp_path):
    detail_path = tmp_path / "detail.json"
    tmp_root = tmp_path / "tmproot"
    tmp_root.mkdir()
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    # one relational + one STREAMING query that mkdtemps a parquet
    # sink root: the stream leaves the StateStore machinery running
    # (the chatter the exit path must fence off the metric line from)
    # and the temp root must be reaped despite os._exit skipping
    # atexit (ADVICE r09: every bench run used to leak several
    # parquet-filled dirs). TMPDIR points the roots at this test's dir
    # so the assertion is hermetic. Round 12 adds the known repeat-run
    # WARN emitters from bench stderr: sql_udf_scalar and
    # udtf_word_positions re-registered their SQL UDF / Python UDTF on
    # every repeat run ("replaced a previously registered function"),
    # dedup_cluster_cc's localCheckpoint blocks WARN on the
    # per-boundary unpersist, and streaming_cms_ingest (already in the
    # set) re-notices AQE-disabled-for-streaming per start — the
    # stderr assertions below pin all the fixes.
    env["SPARK_GRAFT_BENCH_ONLY"] = (
        "agg_pricing_summary,streaming_cms_ingest,"
        "sql_udf_scalar,dedup_cluster_cc,udtf_word_positions"
    )
    env["SPARK_GRAFT_BENCH_BUDGET_S"] = "30"
    env["SPARK_GRAFT_BENCH_DETAIL_PATH"] = str(detail_path)
    env["TMPDIR"] = str(tmp_root)
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=REPO_ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    assert lines, "bench printed nothing to stdout"
    obj = json.loads(lines[-1])  # LAST line must be the metric line
    assert obj["metric"] == "headline_query_wall_clock_total"
    assert obj["n_queries"] == 5
    assert obj["value"] > 0
    # bench-tail hygiene (VERDICT r11 nit #1): the driver keeps a ~2 KB
    # merged tail, so the avoidable WARN chatter must be gone at source
    # — idempotent SQL-UDF/Python-UDTF registration kills the
    # function-registry replace warnings; the bench session scopes the
    # MapPartitionsRDD (localCheckpoint unpersist) and
    # ResolveWriteToStream (AQE-in-streaming notice) loggers to ERROR.
    assert "replaced a previously registered function" not in proc.stderr
    assert "locally checkpointed" not in proc.stderr
    assert "not supported in streaming DataFrames" not in proc.stderr
    # the full artifact went to the overridden detail path, and the
    # metric line names that actual artifact, not a hardcoded default
    assert obj["detail"] == detail_path.name
    detail = json.loads(detail_path.read_text())
    assert set(detail["queries"]) == {
        "agg_pricing_summary",
        "streaming_cms_ingest",
        "sql_udf_scalar",
        "dedup_cluster_cc",
        "udtf_word_positions",
    }
    # a clean run records no per-query persistent-RDD residue
    assert detail["leaked_rdds"] == {}
    # the ONLY test seam skips the rotating extras slot (the metric
    # line and headline numbers always come first), but the round and
    # canary fields are still published
    assert detail["extras"] == {}
    assert detail["extras_total"] == 0
    assert detail["extras_timed_runs"] == {}
    assert detail["extras_errors"] == {}
    assert detail["round"] >= 12
    rstats = detail["repeat_run_stats"]
    assert (
        rstats["total_best"] <= rstats["total_mid"] <= rstats["total_worst"]
    )
    # per-query timed-run lists (VERDICT r12 ask #2): every headline
    # query publishes its post-warmup executions so a driver-side
    # outlier self-diagnoses (all-slow = stall window, one-slow =
    # jitter) without a judge re-run; the recorded timing is the best
    # of exactly that list
    assert set(detail["timed_runs"]) == set(detail["queries"])
    for name, runs in detail["timed_runs"].items():
        assert runs and all(r > 0 for r in runs)
        assert min(runs) == detail["queries"][name]
    # per-run [start, stop] loop-clock spans + wall anchor (VERDICT r15
    # ask #2): index-aligned with timed_runs, each span's width equal to
    # the recorded duration, so an all-runs-slow outlier is placeable ON
    # the run timeline instead of only visible as a slow best-of-N.
    # Shared contract helper (ADVICE r16): one definition for all
    # artifact types, including the non-overlap ordering check.
    assert_spans_match_runs(detail, "timed_run_spans", "timed_runs")
    assert detail["extras_timed_run_spans"] == {}  # ONLY seam: no extras
    # every parquet-filled spark_graft_* temp root (streaming sinks +
    # layout store) was reaped before exit. The uid-keyed symlink
    # staging dir (spark_graft_stream_*) is exempt: it is shared
    # across processes by design (reaping it could yank links out
    # from under a concurrent session's live file stream) and holds
    # only symlinks into the read-only fixtures — zero data bytes.
    leftovers = sorted(
        p.name
        for p in tmp_root.glob("spark_graft_*")
        if not p.name.startswith("spark_graft_stream_")
    )
    assert not leftovers, leftovers
    staging = list(tmp_root.glob("spark_graft_stream_*/*/events/*"))
    assert all(p.is_symlink() for p in staging), staging


def test_bench_sweep_subprocess_writes_nonheadline_artifact(tmp_path):
    """--sweep mode (VERDICT r12 ask #6): the non-headline sweep that
    produced BENCH_DETAIL_r12_nonheadline.json by hand must be
    regenerable on demand — same artifact shape (metric/note/total/
    queries/errors/leaked_rdds, trailing newline), metric line last on
    stdout, ONLY seam narrowing the pool for this test."""
    sweep_path = tmp_path / "nonheadline.json"
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    env["SPARK_GRAFT_BENCH_ONLY"] = "agg_having,etl_minmax_bounds"
    env["SPARK_GRAFT_BENCH_SWEEP_PATH"] = str(sweep_path)
    proc = subprocess.run(
        [sys.executable, "bench.py", "--sweep"],
        cwd=REPO_ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.splitlines() if ln.strip()]
    obj = json.loads(lines[-1])  # LAST line must be the metric line
    assert obj["metric"] == "nonheadline_query_wall_clock"
    assert obj["n_queries"] == 2
    assert obj["n_errors"] == 0
    assert obj["total"] > 0
    raw = sweep_path.read_text()
    assert raw.endswith("\n")  # artifact-newline convention (ADVICE r12)
    detail = json.loads(raw)
    assert set(detail["queries"]) == {"agg_having", "etl_minmax_bounds"}
    assert detail["errors"] == {}
    assert detail["leaked_rdds"] == {}
    assert detail["total"] == round(sum(detail["queries"].values()), 4)
    # sweep names must genuinely be outside the headline list
    assert not set(detail["queries"]) & set(bench.HEADLINE)
    # sweep run lists (VERDICT r13 ask #2): same self-diagnosis
    # convention as the headline artifact — every swept query
    # publishes its post-warmup executions and the recorded number is
    # the best of exactly that list
    assert set(detail["timed_runs"]) == set(detail["queries"])
    for name, runs in detail["timed_runs"].items():
        assert runs and all(r > 0 for r in runs)
        assert min(runs) == detail["queries"][name]
    # sweep spans follow the same convention as the headline artifact
    # (VERDICT r15 ask #2), via the shared helper (ADVICE r16) — this
    # copy previously omitted the non-overlap ordering check
    assert_spans_match_runs(detail, "timed_run_spans", "timed_runs")


def test_bench_sweep_empty_pool_refuses_to_write(tmp_path):
    """ADVICE r13: SPARK_GRAFT_BENCH_ONLY naming only headline queries
    (or misspellings) used to produce an empty sweep artifact with exit
    0 — a typo masquerading as a successful sweep. The guard must now
    refuse loudly, before a session ever starts, and write nothing."""
    sweep_path = tmp_path / "nonheadline.json"
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = "/root/testdata/sf0.001"
    # one headline name + one typo: both filtered out of the pool
    env["SPARK_GRAFT_BENCH_ONLY"] = "agg_pricing_summary,no_such_query"
    env["SPARK_GRAFT_BENCH_SWEEP_PATH"] = str(sweep_path)
    proc = subprocess.run(
        [sys.executable, "bench.py", "--sweep"],
        cwd=REPO_ROOT,
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 2
    assert "matched no non-headline query" in proc.stderr
    assert not sweep_path.exists()


def test_safe_boundary_release_records_broken_bridge():
    """ADVICE r13: the extras/sweep boundary release must never abort
    the loop — a broken session records a <name>#boundary error and
    the metric line still prints."""

    class _BrokenSpark:
        class catalog:  # noqa: N801 — mimics SparkSession.catalog
            @staticmethod
            def clearCache():
                raise RuntimeError("py4j bridge down")

    errors: dict = {}
    leaked: dict = {}
    bench.safe_boundary_release(_BrokenSpark(), "q1", leaked, errors)
    assert list(errors) == ["q1#boundary"]
    assert "py4j bridge down" in errors["q1#boundary"]
    assert leaked == {}


def test_safe_boundary_release_healthy_session_is_silent(spark):
    errors: dict = {}
    leaked: dict = {}
    bench.safe_boundary_release(spark, "q1", leaked, errors)
    assert errors == {}
    assert leaked == {}


def test_release_executor_state_frees_persist_and_localcheckpoint(spark):
    df_p = spark.range(0, 1000).persist()
    df_p.count()
    df_c = spark.range(0, 1000).localCheckpoint()  # eager by default
    df_c.count()
    jsc = spark.sparkContext._jsc
    assert jsc.getPersistentRDDs().size() >= 2
    bench.release_executor_state(spark)
    assert jsc.getPersistentRDDs().size() == 0
