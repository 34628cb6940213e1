"""Shared span-contract assertion for bench artifacts (ADVICE r16).

One definition, imported by test_bench_contract.py (committed
canonical snapshot + newest committed sweep artifact) and
test_bench_harness.py (freshly-generated in-process and sweep
subprocess artifacts), so every artifact type is held to the
identical contract — including the non-overlap ordering check the
sweep-subprocess test previously omitted.
"""


def assert_spans_match_runs(detail, spans_key, runs_key):
    """Span-contract checks (VERDICT r15 ask #2): spans are
    index-aligned with the run lists, each [start, stop] is ordered and
    non-negative on the loop clock, each span's width equals the
    recorded duration within rounding (same perf_counter reads; stop is
    derived as start + duration, see bench.span_of), and a query's
    spans never overlap (the loop is sequential)."""
    assert detail["run_t0_unix"] > 0
    assert set(detail[spans_key]) == set(detail[runs_key])
    for name, spans in detail[spans_key].items():
        runs = detail[runs_key][name]
        assert len(spans) == len(runs), name
        for (start, stop), dur in zip(spans, runs):
            assert 0 <= start < stop, name
            assert abs((stop - start) - dur) <= 0.001, name
        for (_, stop), (nxt, _) in zip(spans, spans[1:]):
            assert nxt >= stop, name
