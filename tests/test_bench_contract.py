"""Bench harness contract — guards the two r4 failure classes without
running the bench: every benched name must exist in the registry (a
typo silently KeyErrors mid-run), the set must cover the operators the
judge tracks (r4 shipped five queries with correctness rows but no
bench rows), and the stdout object must stay compact enough that a
fixed-size tail capture always parses it (BENCH_r04 was lost to
truncation)."""

import importlib.util
import json
import os

from customer_churn_prediction_spark.plans import registry


def _load_bench():
    path = os.path.join(
        os.path.dirname(os.path.dirname(__file__)), "bench.py"
    )
    spec = importlib.util.spec_from_file_location("bench_contract", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_bench_names_exist_and_are_unique():
    bench = _load_bench()
    names = bench.BENCH_QUERIES
    assert len(names) == len(set(names)), "duplicate bench entries"
    missing = set(names) - set(registry.QUERIES)
    assert not missing, f"benched names absent from registry: {missing}"


def test_bench_covers_recent_additions():
    bench = _load_bench()
    names = set(bench.BENCH_QUERIES)
    # The operators added in r4/r5 the judge tracks for bench rows.
    tracked = {
        # (ann_bruteforce_int8 retired r10 — benched via the matrix)
        "ann_bruteforce_int8_stored",
        "embedding_quantize", "text_redact", "dedup_simhash",
        "dedup_cross_modal", "dedup_semantic",
        # (text_repetition / text_logprob retired r13 — both gates
        # still execute inside the benched corpus_keep_decision)
        "corpus_mix", "contamination_check",
        "ann_recall_eval", "user_event_sequences",
        # r6 registrations must land bench rows in the same round
        # (ann_pq_adc / ann_ivf_pq retired r10 — benched via the matrix)
        "embedding_pq", "ann_ivf_pq_stored",
        "text_dup_spans", "corpus_clean_spans", "corpus_split_leakproof",
        "model_calibration", "feature_iv", "event_sessions",
        # r7 registration
        "vocab_bpe_merges",
        # r8 registration
        "text_tokenize_bpe",
        # r9 registration
        "heavy_hitters_cms",
        # r10 registrations
        "dedup_containment", "rec_eval_ndcg", "ann_recall_matrix",
        "dedup_recall_eval", "corpus_select_dsir",
        # r11 registration
        "events_resample_ffill",
        # r12 registrations
        "vocab_eval_compression", "session_transitions",
        # r13 registrations
        "text_logprob_bigram", "corpus_sample_weighted",
    }
    assert tracked <= names, sorted(tracked - names)


def test_bench_stdout_object_stays_compact():
    """The driver records a fixed-size tail of stdout whose OBSERVED
    window is ~2,000 chars (BENCH_r10 landed with "parsed": null when
    the r10 line outgrew it; the old 16 KiB bound here was calibrated
    to the wrong window). Emulate the slim r11 result line at current
    query count with worst-case 7-char medians and assert it stays
    under 1,900 chars — per-query annotation detail (load context,
    movers, spreads, steady medians) must live in bench_out.json, not
    stdout."""
    bench = _load_bench()
    # the REAL schema function at worst-case field widths — a
    # hand-mirrored dict here would drift and miss a re-added
    # per-query field (the BENCH_r10 regression class)
    result = bench.stdout_result(
        total=9999.999,
        timings={name: 999.999 for name in bench.BENCH_QUERIES},
        sf=0.1,
        contended=True,
        steady_total=9999.999,
        n_movers=99,
        cal=[999.999 for _ in bench.CALIBRATION],
        dcal=9.999,
    )
    line = json.dumps(result, separators=(",", ":"))
    assert len(line) < 1900, len(line)
    # And the per-query annotation detail goes to the file, not
    # stdout: the stdout schema must stay free of any field that
    # scales with the query count beyond the medians dict itself.
    for banned in (
        "spread", "load_elevated", "steady_rechecked", "movers",
        "steady", "load_series", "prev_delta_cal",
    ):
        assert banned not in result


def test_cal_ratio_and_prev_cal_loader():
    """The box-speed anchor (r13): median of per-probe ratios over
    shared calibration queries, None when nothing is shared or a prev
    probe is zero; the loader degrades like the median loader."""
    bench = _load_bench()
    now = {"a": 0.2, "b": 0.4, "c": 0.8}
    prev = {"a": 0.1, "b": 0.4, "c": 0.4}
    # ratios 2.0, 1.0, 2.0 -> median 2.0
    assert bench._cal_ratio(now, prev) == 2.0
    assert bench._cal_ratio(now, {}) is None
    assert bench._cal_ratio(now, {"a": 0.0}) is None
    assert bench._cal_ratio({}, prev) is None


def test_prev_cal_loader_guards(tmp_path):
    bench = _load_bench()
    out = tmp_path / "bench_out.json"
    assert bench._load_prev_cal(str(out), 0.1) == {}  # absent
    out.write_text("not json {")
    assert bench._load_prev_cal(str(out), 0.1) == {}  # unreadable
    out.write_text(json.dumps(
        {"sf": 0.01, "cal_queries": {"q": 1.0}}
    ))
    assert bench._load_prev_cal(str(out), 0.1) == {}  # other SF
    out.write_text(json.dumps(
        {"sf": 0.1, "cal_queries": {"q1": 0.5}}
    ))
    assert bench._load_prev_cal(str(out), 0.1) == {"q1": 0.5}


def test_sec_width_discipline():
    """Millisecond precision below 100 s (every real median);
    centisecond at or above — the worst-case-width cap the compact
    ratchet relies on."""
    bench = _load_bench()
    assert bench._sec(1.2345) == 1.234 or bench._sec(1.2345) == 1.235
    assert bench._sec(99.9994) == 99.999
    assert bench._sec(999.999) == 1000.0
    assert bench._sec(123.456) == 123.46


def test_prev_median_loader_guards(tmp_path):
    """The noise-check path compares against the previous bench_out
    only when it is present, parseable, and at the SAME scale factor —
    cross-SF deltas would flag every query as moved."""
    bench = _load_bench()
    out = tmp_path / "bench_out.json"
    assert bench._load_prev_medians(str(out), 0.1) == {}  # absent
    out.write_text("not json {")
    assert bench._load_prev_medians(str(out), 0.1) == {}  # unreadable
    out.write_text(json.dumps(
        {"sf": 0.01, "queries": {"q": 1.0}}
    ))
    assert bench._load_prev_medians(str(out), 0.1) == {}  # other SF
    out.write_text(json.dumps(
        {"sf": 0.1, "queries": {"q1": 1.5, "q2": 0.25}}
    ))
    assert bench._load_prev_medians(str(out), 0.1) == {
        "q1": 1.5, "q2": 0.25
    }


def test_elevated_queries_flags_only_external_bursts():
    """The per-query load signal judges against the run's own median
    (Spark itself saturates the box), flags only >4-thread bursts
    above it, and degrades to no-signal on an empty sample set."""
    bench = _load_bench()
    loads = {
        # steady at the bench's own operating load
        "quiet": [30.0, 30.5, 31.0, 30.2, 30.8],
        # one external burst mid-measurement
        "bursty": [30.1, 30.4, 35.5, 30.3, 30.6],
        # slightly above median but inside the 4-thread band
        "warm": [31.0, 32.0, 33.0, 31.5, 32.5],
    }
    base, flagged = bench._elevated_queries(loads)
    assert base == 30.8  # median over every sample
    assert flagged == ["bursty"]
    assert bench._elevated_queries({}) == (0.0, [])
    assert bench._elevated_queries({"q": []}) == (0.0, [])
