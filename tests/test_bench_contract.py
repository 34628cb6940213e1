"""Bench output contract: the driver parses a single compact stdout
line, so the name lists and the byte budget are load-bearing — a
renamed query would today vanish from HEADLINE/CORE silently (both
filter through `if n in ...`), and a fatter CORE map could re-overflow
the driver's ~2 KB tail capture (the round-5 failure mode)."""

import json
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import bench  # noqa: E402

from golang_etl_spark.registry import all_queries  # noqa: E402
from tests.span_contract import assert_spans_match_runs  # noqa: E402


def test_headline_names_all_resolve():
    names = set(all_queries())
    missing = [n for n in bench.HEADLINE if n not in names]
    assert not missing, f"HEADLINE entries not in registry: {missing}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicates"


def test_core_is_a_stable_headline_subset():
    assert set(bench.CORE) <= set(bench.HEADLINE), (
        sorted(set(bench.CORE) - set(bench.HEADLINE))
    )
    # the cross-round comparison key set: never shrink it
    assert len(bench.CORE) >= 30


def test_compact_line_fits_tail_capture_worst_case():
    # worst case: every core query at a 4-digit-second timing, plus an
    # extras slot filled with the LONGEST non-headline names (the r12
    # rotation could land on any 10 of them)
    pool = sorted(
        set(all_queries()) - set(bench.HEADLINE), key=len, reverse=True
    )
    line = json.dumps(
        {
            "metric": "headline_query_wall_clock_total",
            "value": 9999.9999,
            "unit": "sec",
            "sf": 0.1,
            "n_queries": len(bench.HEADLINE),
            "core_total": 9999.9999,
            "total_mid": 99999.9999,
            "total_worst": 99999.9999,
            "rel_spread_p90": 99.9999,
            "host_steal_pct": 99.99,
            "jvm_gc_sec": 9999.99,
            "queries": {n: 9999.9999 for n in bench.CORE},
            "extras": {
                n: 9999.9999 for n in pool[: bench.EXTRAS_PER_ROUND]
            },
            "detail": "BENCH_DETAIL.json",
        }
    )
    assert len(line.encode()) <= bench.MAX_LINE_BYTES, len(line.encode())


def test_repeat_stats_error_bars():
    """The canary error bars are a permanent bench output (VERDICT r10
    ask #5): repeat_stats must summarize the timed (post-warmup) runs
    the best-of-N loop already collects — totals band from per-query
    best/worst, relative spreads, widest offenders — and stay defined
    for degenerate inputs (single timed run => no spread rows)."""
    s = bench.repeat_stats(
        {
            "a": [1.0, 1.5, 1.25],  # spread 0.5
            "b": [2.0, 2.0],  # spread 0.0
            "c": [3.0],  # overrun band: single timed run
        }
    )
    assert s["queries_with_repeats"] == 2
    assert s["timed_runs_total"] == 6
    assert s["total_best"] == 6.0
    assert s["total_worst"] == 6.5
    # unbiased canary denominator (VERDICT r11 ask #4)
    assert s["total_mid"] == 6.25
    assert s["rel_spread_max"] == 0.5
    # standard nearest-rank percentiles (ADVICE r11): with spreads
    # [0.0, 0.5] the median is the LOWER middle, not the max
    assert s["rel_spread_median"] == 0.0
    assert s["rel_spread_p90"] == 0.5
    assert set(s["widest"]) == {"a", "b"}
    assert s["widest"]["a"] == 0.5
    # single-run-only input (full-overrun bench) must not divide by 0
    empty = bench.repeat_stats({"x": [1.0]})
    assert empty["queries_with_repeats"] == 0
    assert empty["rel_spread_median"] == 0.0
    assert empty["rel_spread_max"] == 0.0
    assert empty["total_mid"] == empty["total_best"] == empty["total_worst"] == 1.0


def test_run_shedding_bands():
    """The repeat-run policy: best-of-3 timed runs in the first half
    of the budget, best-of-2 through DOUBLE the budget (so the whole
    tail of a normal full run keeps jitter filtering — the r09
    post-mortem traced every run-over-run outlier to the old
    single-timed-run band past 1x budget), single timed run only in
    genuine overrun."""
    b = bench.BUDGET_S
    assert bench.n_runs_for(0.0) == 4
    assert bench.n_runs_for(0.5 * b) == 4
    assert bench.n_runs_for(0.6 * b) == 3
    assert bench.n_runs_for(1.9 * b) == 3
    assert bench.n_runs_for(2.1 * b) == 2


def test_pinned_queries_keep_full_repeats_at_any_elapsed_time():
    """window_gaps_islands sits deep in the frozen HEADLINE order and
    was r09's only out-of-band driver sample (0.73s vs 0.23s local, a
    single best-of-2 tail measurement). Pinned names must get the full
    warm+best-of-3 policy no matter how much budget has burned."""
    assert "window_gaps_islands" in bench.ALWAYS_BEST_OF_3
    assert bench.ALWAYS_BEST_OF_3 <= set(bench.HEADLINE)
    for spent in (0.0, bench.BUDGET_S, 3 * bench.BUDGET_S):
        for name in bench.ALWAYS_BEST_OF_3:
            assert bench.n_runs_for(spent, name) == 4
    # and the pin does not change the policy for everyone else
    assert bench.n_runs_for(3 * bench.BUDGET_S, "agg_pricing_summary") == 2


def test_extras_rotation_is_deterministic_and_tiles_the_pool():
    """The rotating extras slot (VERDICT r11 ask #3): 10 non-headline
    names per round, pure function of (round number, pool), consecutive
    rounds cover every name, and selection never touches HEADLINE — so
    the headline total stays comparable across rounds while every
    registered query gets a timing row every ~5 rounds."""
    pool = sorted(set(all_queries()) - set(bench.HEADLINE))
    assert len(pool) >= 50, "non-headline tail shrank unexpectedly"
    sel = bench.extras_for_round(12, pool)
    assert len(sel) == bench.EXTRAS_PER_ROUND
    assert set(sel) <= set(pool)
    assert not set(sel) & set(bench.HEADLINE)
    # deterministic and input-order-insensitive
    assert sel == bench.extras_for_round(12, list(reversed(pool)))
    # consecutive rounds tile the whole pool
    seen: set = set()
    rounds_to_cover = -(-len(pool) // bench.EXTRAS_PER_ROUND)
    for r in range(1, rounds_to_cover + 1):
        seen.update(bench.extras_for_round(r, pool))
    assert seen == set(pool)
    # degenerate pools stay defined
    assert bench.extras_for_round(5, []) == []
    assert bench.extras_for_round(5, ["only"]) == ["only"]


def test_compact_line_sheds_extras_before_core():
    """The byte guard's trim path (never reached by a normal-size
    line): an oversized line must drop rotating extras entries first
    and only then eat into the cross-round core map — and always
    return a parseable line whose scalar head (the total) survives."""
    big = {f"core_q_{i:02d}": 9999.9999 for i in range(40)}
    extras = {f"extra_q_{i:02d}": 9999.9999 for i in range(10)}
    obj = {
        "metric": "headline_query_wall_clock_total",
        "value": 123.4567,
        "queries": dict(big),
        "extras": dict(extras),
        "detail": "BENCH_DETAIL.json",
    }
    # force trimming with a tiny budget, restore after
    orig = bench.MAX_LINE_BYTES
    bench.MAX_LINE_BYTES = 700
    try:
        line = bench.compact_line(obj)
    finally:
        bench.MAX_LINE_BYTES = orig
    parsed = json.loads(line)
    assert len(line.encode()) <= 700
    assert parsed["value"] == 123.4567  # the head survived
    assert parsed["extras"] == {}, "extras must be shed before core"
    assert 0 < len(parsed["queries"]) < 40, "core trimmed only as needed"
    # and a line already under budget is untouched
    small = {"metric": "m", "value": 1.0, "queries": {"a": 1.0}, "extras": {}}
    assert json.loads(bench.compact_line(small)) == small


def test_infer_round_env_override_and_artifact_scan(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_BENCH_ROUND", "7")
    assert bench.infer_round() == 7
    monkeypatch.delenv("SPARK_GRAFT_BENCH_ROUND")
    # the repo root carries BENCH_r01..r11, so the round being benched
    # from this checkout is at least 12
    assert bench.infer_round() >= 12


def test_steal_gauge_parses_proc_stat_and_degrades_to_none():
    """The host-steal gauge (round 12: same-HEAD totals split 124s vs
    147s purely by hypervisor contention) — pin the /proc/stat field
    position and the never-cost-the-run degradation paths."""
    # kernel-doc field order: user nice system idle iowait irq softirq
    # steal guest guest_nice — steal is the 8th value, and the total
    # must sum ONLY user..steal: guest/guest_nice (here 40/5) are
    # already folded into user/nice by the kernel, so counting them
    # would double-count guest time and deflate steal% (ADVICE r12)
    text = "cpu  100 0 50 800 10 0 5 35 40 5\ncpu0 25 0 12 200 2 0 1 8 0 0\n"
    steal, total = bench.parse_proc_stat_cpu(text)
    assert steal == 35
    assert total == 1000  # guest fields excluded from the denominator
    # pre-2.6.11 kernels have no steal field: gauge reads 0, not IndexError
    assert bench.parse_proc_stat_cpu("cpu  1 2 3 4\n") == (0, 10)
    # no aggregate cpu line at all (locked-down /proc): (0, 0)
    assert bench.parse_proc_stat_cpu("intr 0 0\n") == (0, 0)

    # percentage over a window: (135-35)/(2000-1000) = 10%
    assert bench.steal_pct((35, 1000), (135, 2000)) == 10.0
    # unmeasurable inputs -> None (the artifact records null)
    assert bench.steal_pct(None, (135, 2000)) is None
    assert bench.steal_pct((35, 1000), None) is None
    assert bench.steal_pct((35, 1000), (35, 1000)) is None  # zero window

    # and the live read on this Linux host returns a plausible pair
    live = bench.read_host_cpu_counters()
    assert live is None or (live[1] > 0 and 0 <= live[0] <= live[1])


def test_committed_bench_detail_carries_timed_runs():
    """The canonical BENCH_DETAIL.json snapshot must publish each
    headline query's timed (post-warmup) executions (VERDICT r12 ask
    #2): a driver-bench outlier then self-diagnoses from its repeat
    pattern — all runs slow means a stall window ate the query's
    whole slot (environmental), one slow run with a normal best means
    single-sample jitter best-of-N already filtered — instead of
    needing a judge-side re-run, as r12's dedup_simhash 7.0s did. The
    recorded per-query number must be the best of exactly that list."""
    detail = json.loads(
        (Path(bench.__file__).resolve().parent / "BENCH_DETAIL.json").read_text()
    )
    assert set(detail["timed_runs"]) == set(detail["queries"])
    for name, runs in detail["timed_runs"].items():
        assert runs and all(r > 0 for r in runs), name
        assert min(runs) == detail["queries"][name], name


def test_committed_bench_detail_carries_extras_timed_runs():
    """Round-14 symmetry pin (VERDICT r13 ask #2): the rotating extras
    in the canonical snapshot publish their run lists exactly like the
    headline queries do, so an extras-slot outlier self-diagnoses from
    its repeat pattern instead of needing a judge-side re-run. Each
    recorded extras number must be the best of exactly that list."""
    detail = json.loads(
        (Path(bench.__file__).resolve().parent / "BENCH_DETAIL.json").read_text()
    )
    assert set(detail["extras_timed_runs"]) == set(detail["extras"])
    for name, runs in detail["extras_timed_runs"].items():
        assert runs and all(r > 0 for r in runs), name
        assert min(runs) == detail["extras"][name], name


def test_latest_committed_sweep_artifact_carries_timed_runs():
    """The newest committed BENCH_DETAIL_r{N}_nonheadline.json must
    carry per-query run lists (VERDICT r13 ask #2). Only the latest is
    pinned: older sweep artifacts predate the field and are historical
    records of their rounds, deliberately not regenerated."""
    root = Path(bench.__file__).resolve().parent
    sweeps = {}
    for p in root.glob("BENCH_DETAIL_r*_nonheadline.json"):
        m = re.fullmatch(r"BENCH_DETAIL_r(\d+)_nonheadline\.json", p.name)
        # the glob is wider than the convention (it would also match
        # e.g. BENCH_DETAIL_r14b_nonheadline.json); fail loudly with
        # the filename rather than crash on m.group(1) (ADVICE r14)
        assert m, f"sweep artifact name breaks r<N> convention: {p.name}"
        sweeps[int(m.group(1))] = p
    assert sweeps, "no committed sweep artifact"
    detail = json.loads(sweeps[max(sweeps)].read_text())
    assert set(detail["timed_runs"]) == set(detail["queries"])
    for name, runs in detail["timed_runs"].items():
        assert runs and all(r > 0 for r in runs), name
        assert min(runs) == detail["queries"][name], name


def test_span_of_is_strictly_ordered_even_below_the_rounding_quantum():
    """ADVICE r16: span endpoints used to be rounded to 4 decimals
    independently of the duration, so a run shorter than ~0.05ms could
    round to start == stop and trip the contract's `start < stop`.
    span_of now derives stop from the rounded start plus the measured
    duration with a one-quantum floor — strict ordering by
    construction, width within the contract's 1e-3 tolerance."""
    # sub-quantum duration: the old independent rounding collapses this
    start, stop = bench.span_of(0.0, 5.00001, 5.00002)
    assert start < stop
    assert stop - start <= 0.001 + 1e-12
    # zero-duration degenerate input still yields an ordered span
    start, stop = bench.span_of(0.0, 7.25, 7.25)
    assert start < stop
    # normal durations keep width == duration within rounding
    start, stop = bench.span_of(1.0, 3.0, 4.5)
    assert (start, stop) == (2.0, 3.5)
    # and the offsets stay anchored to the loop clock
    assert bench.span_of(0.0, 0.0, 0.5) == [0.0, 0.5]


def test_committed_bench_detail_carries_timed_run_spans():
    """Round-16 pin (VERDICT r15 ask #2): r15's similarity_pq_fixed was
    slow in ALL THREE driver timed runs (best 19.4s vs ~2s local, same
    code) — best-of-N can't filter an all-runs-slow stall, and the
    steal/GC gauges are per-run-total, so the stall could not be PLACED
    within the run. The canonical snapshot must now carry per-timed-run
    [start, stop] offsets on the loop's monotonic clock (headline AND
    rotating extras) plus the run_t0_unix wall anchor, so a future loud
    window aligns against the run timeline and host-side timestamps."""
    detail = json.loads(
        (Path(bench.__file__).resolve().parent / "BENCH_DETAIL.json").read_text()
    )
    assert_spans_match_runs(detail, "timed_run_spans", "timed_runs")
    assert_spans_match_runs(detail, "extras_timed_run_spans", "extras_timed_runs")


def test_latest_committed_sweep_artifact_carries_timed_run_spans():
    """Same span convention for the newest committed sweep artifact
    (VERDICT r15 ask #2); older sweeps predate the field and are
    historical records of their rounds, deliberately not regenerated."""
    root = Path(bench.__file__).resolve().parent
    sweeps = {}
    for p in root.glob("BENCH_DETAIL_r*_nonheadline.json"):
        m = re.fullmatch(r"BENCH_DETAIL_r(\d+)_nonheadline\.json", p.name)
        assert m, f"sweep artifact name breaks r<N> convention: {p.name}"
        sweeps[int(m.group(1))] = p
    assert sweeps, "no committed sweep artifact"
    detail = json.loads(sweeps[max(sweeps)].read_text())
    assert_spans_match_runs(detail, "timed_run_spans", "timed_runs")


def test_committed_bench_artifacts_end_with_newline():
    """Builder-authored bench artifacts (BENCH_DETAIL*.json) follow
    the trailing-newline convention bench.py itself writes (ADVICE
    r12). Driver-written artifacts (BENCH_r*, CORRECTNESS_r*) are the
    driver's format and are deliberately not covered."""
    root = Path(bench.__file__).resolve().parent
    for p in sorted(root.glob("BENCH_DETAIL*.json")):
        assert p.read_text().endswith("\n"), p.name


def test_gc_gauge_delta_and_live_read(spark):
    """gc_delta_sec degradation paths, and a live MXBean read on the
    test session returns a plausible cumulative counter."""
    assert bench.gc_delta_sec(1000, 3500) == 2.5
    assert bench.gc_delta_sec(None, 3500) is None
    assert bench.gc_delta_sec(1000, None) is None
    assert bench.gc_delta_sec(3500, 1000) is None  # counter reset/rollover
    live = bench.jvm_gc_millis(spark)
    assert live is None or live >= 0
