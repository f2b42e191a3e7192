"""The bench output contract the driver depends on (VERDICT r6 #1).

The driver captures only the TAIL of bench stdout (~2000 chars) and parses
the final JSON line. Round 6's inline extras pushed that line past the
window and the round's BENCH artifact recorded parsed:null — these tests
pin the fix: the final line is compact, self-contained, and never exceeds
TAIL_SAFE_CHARS no matter how the extra sections grow.
"""

from __future__ import annotations

import json

import pytest

import bench


def _headline(n_queries: int = 40) -> dict:
    return {
        "metric": "headline_query_wall_seconds",
        "value": 26.653,
        "unit": "sec",
        # 18-char names = the repo's real average (measured on BENCH_r05)
        "queries": {f"q{i:02d}_realistic_name": round(0.5 + i * 0.037, 3)
                    for i in range(n_queries)},
        "sf": 0.1,
        "n": 3,
        "value_per_calib": 78.03,
        "value_per_sched": 180.7,
    }


def _extras() -> dict:
    serving = {"p50": 2.73, "p99": 4.41, "p50_rerank": 3.1,
               "p50_sharded_router": 3.9, "n_queries": 32,
               "index_rows": 100_000, "snapshot_load_s": 0.25,
               "layout_write_s": 1.2, "layout_search_s": 0.97}
    return {
        "serving_ms": serving,
        "serving_ms_fixture": dict(serving, index_rows=2000),
        "serving_http_ms": {"p50": 4.67, "p99": 6.94, "p50_adc": 4.1,
                            "n_queries": 32},
        "serving_1m_ms": {"p50": 5.71, "p99": 17.63,
                          "p50_sharded_router": 4.93, "n_queries": 32,
                          "index_rows": 1_000_000, "snapshot_load_s": 2.44},
        "serving_skew_ms": {"p50": 6.0, "p99": 21.0,
                            "p50_sharded_router": 5.1,
                            "p99_sharded_router": 9.0, "hot_cell_rows": 100_000,
                            "hot_rate": 0.4, "index_rows": 1_000_000},
        "second_tier": {"n": 30, "total_s": 25.1},
        "curation": {"seconds": 4.5, "input_docs": 5000, "docs_per_sec": 1111.1},
        "curation_full": {"seconds": 6.5, "input_docs": 5000,
                          "docs_per_sec": 769.0},
        "train": {"fit_spark_seconds": 9.8, "rows": 6000},
        "layout_search": {"write_s": 1.3, "search_s": 0.8},
        "cpu_calib_sec": {"pre": 0.35, "post": 0.36, "post_second_tier": 0.35,
                          "post_serving": 0.36, "post_serving_1m": 0.37,
                          "post_curation": 0.35, "post_curation_full": 0.36,
                          "post_train": 0.35},
        "sched_calib_sec": {"pre": 0.074, "post": 0.073},
    }


def test_final_line_fits_tail_window_with_all_extras():
    lines = bench.compose_output_lines(_headline(), _extras())
    assert len(lines) == 2
    final = lines[-1]
    assert len(final) <= bench.TAIL_SAFE_CHARS
    parsed = json.loads(final)
    # the driver's done-criteria keys (VERDICT r6 next-round #1)
    for key in ("metric", "value", "unit", "queries", "sf", "n",
                "value_per_calib", "value_per_sched"):
        assert key in parsed, key
    assert len(parsed["queries"]) == 40
    # the r7 skew evidence rides the parsed artifact
    assert parsed["serving_skew"]["p99"] == 21.0
    assert parsed["serving_1m"]["p50"] == 5.71


def test_extras_line_carries_full_sections():
    lines = bench.compose_output_lines(_headline(), _extras())
    extras = json.loads(lines[0])["bench_extras"]
    assert extras["serving_1m_ms"]["index_rows"] == 1_000_000
    assert extras["cpu_calib_sec"]["post_train"] == 0.35


def test_summaries_drop_before_contract_keys():
    """Under size pressure the serving summaries shed one by one; the
    contract keys survive as long as they alone fit."""
    big = _headline(n_queries=60)  # queries alone near the limit
    lines = bench.compose_output_lines(big, _extras())
    parsed = json.loads(lines[-1])
    assert len(lines[-1]) <= bench.TAIL_SAFE_CHARS
    assert "queries" in parsed and "value_per_sched" in parsed
    # at least one summary was dropped to make room
    kept = [k for k in ("serving", "serving_1m", "serving_skew", "http")
            if k in parsed]
    assert len(kept) < 4


def test_oversized_contract_fails_loudly():
    huge = _headline(n_queries=120)
    with pytest.raises(RuntimeError, match="tail-capture window"):
        bench.compose_output_lines(huge, _extras())


def test_final_line_is_last_and_valid_json():
    lines = bench.compose_output_lines(_headline(), _extras())
    # every emitted line parses on its own — the driver may grab any suffix
    for ln in lines:
        json.loads(ln)
    assert json.loads(lines[-1])["metric"] == "headline_query_wall_seconds"


def test_load_prior_artifact_tolerates_malformed(tmp_path):
    """ADVICE r14: a malformed committed artifact (top-level list,
    non-numeric sf) used to raise AttributeError/TypeError out of the
    prior-run guard and kill the whole bench before any output. Every
    malformed shape now reads as 'no prior' instead."""
    p = tmp_path / "prior.json"
    for content in ("[1, 2, 3]", '{"sf": null}', '{"sf": "0.1"}',
                    '{"no_sf": 1}', '{"sf": true}', "not json at all"):
        p.write_text(content)
        assert bench._load_prior_artifact(str(p), 0.1) == {}, content
    assert bench._load_prior_artifact(str(tmp_path / "absent.json"), 0.1) == {}
    # wrong sf -> untrusted; right sf -> returned verbatim
    p.write_text('{"sf": 0.01, "second_tier": {"q": 1.0}}')
    assert bench._load_prior_artifact(str(p), 0.1) == {}
    p.write_text('{"sf": 0.1, "second_tier": {"q": 1.0}}')
    assert bench._load_prior_artifact(str(p), 0.1)["second_tier"] == {"q": 1.0}


def test_second_tier_trigger_calib_normalized():
    """r15 guard calming (VERDICT r14 #3): uniform host slowness (wall and
    calib both up) cancels and does NOT fire; a genuine per-query 2x move
    at flat calib still does; sub-second specs need 3x."""
    t = bench._second_tier_trigger
    # genuine 2x regression on a >=1 s query at flat calib: fires
    assert t(2.5, 1.2, 0.35, 0.35)
    # same walls, but the host is uniformly 2x slower (calib doubled too):
    # normalized ratio flat -> no fire (this was 11/37 of the r14 tier)
    assert not t(2.5, 1.2, 0.70, 0.35)
    # sub-second spec at flat calib: 2x is within natural spread (no fire),
    # 3x+ fires
    assert not t(0.55, 0.25, 0.35, 0.35)
    assert t(0.80, 0.25, 0.35, 0.35)
    # prior run predates the ladder entry -> raw-wall fallback (old idiom)
    assert t(2.5, 1.2, 0.35, None)
    assert not t(2.3, 1.2, 0.35, None)
    # no/garbage reference -> never fires
    assert not t(9.9, None, 0.35, 0.35)
    assert not t(9.9, 0.0, 0.35, 0.35)
    assert not t(9.9, True, 0.35, 0.35)


def test_attr_serving_calib_stamps_ratios():
    block = {"p50": 2.43, "p99": 3.68, "p50_rerank": 3.0, "index_rows": 100_000}
    bench._attr_serving_calib(block, 0.35)
    assert block["calib_sec"] == 0.35
    assert block["p50_per_calib"] == round(2.43 / 0.35, 2)
    assert block["p99_per_calib"] == round(3.68 / 0.35, 2)
    assert "p50_rerank_per_calib" not in block  # only the canonical keys
    skew = {"p99_parallel_router": 5.72}
    bench._attr_serving_calib(skew, 0.4)
    assert skew["p99_parallel_router_per_calib"] == round(5.72 / 0.4, 2)
    # skipped blocks (SPARK_GRAFT_SERVING_N_LARGE=0) and dead calib: no-op
    bench._attr_serving_calib(None, 0.35)
    b2 = {"p50": 1.0}
    bench._attr_serving_calib(b2, 0.0)
    assert b2 == {"p50": 1.0}


def test_scale_validation_resample_guard(tmp_path, monkeypatch):
    """scripts/scale_validation.py (r13): any section wall >2x the
    previous SCALE_RUNS line's triggers exactly ONE re-run, the faster
    section is kept, and the names land under 'resampled'; an in-envelope
    run appends without re-running. Exercised with stubbed _run_once
    payloads — the guard logic, not the Spark suite."""
    import importlib.util
    import sys
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "scale_validation", Path(__file__).parent.parent / "scripts" / "scale_validation.py"
    )
    sv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sv)
    monkeypatch.setattr(sv, "REPO", tmp_path)

    def sections(mh_wall):
        base = {"calib": {"pre": 0.3, "post": 0.3}}
        for k in sv._WALLED:
            base[k] = {"wall": 10.0, "recall": 0.9, "wall_per_calib": 33.3}
        base["minhash"] = {"wall": mh_wall, "recall": 0.9,
                           "wall_per_calib": round(mh_wall / 0.3, 2)}
        base["serving_1m"] = {"reshard": 0.2, "mismatches": 0}
        return base

    prev = {"date": "2026-08-15", "minhash": {"wall": 15.0}}
    for k in sv._WALLED:
        prev.setdefault(k, {"wall": 10.0})
    (tmp_path / "SCALE_RUNS.jsonl").write_text(json.dumps(prev) + "\n")

    runs = iter([(sections(64.7), 0.3, 0), (sections(11.6), 0.3, 0)])
    calls = []
    monkeypatch.setattr(
        sv, "_run_once", lambda: (calls.append(1), next(runs))[1]
    )
    assert sv.main() == 0
    assert len(calls) == 2  # one resample, not more
    lines = (tmp_path / "SCALE_RUNS.jsonl").read_text().splitlines()
    rec = json.loads(lines[-1])
    assert rec["resampled"] == ["minhash"]
    assert rec["minhash"]["wall"] == 11.6  # the faster section won
    assert rec["emb_lsh"]["wall"] == 10.0  # untouched sections kept
    assert rec["calib_resample"] == {"pre": 0.3, "post": 0.3}

    # in-envelope run: no re-run, resampled empty
    calls.clear()
    runs = iter([(sections(14.0), 0.3, 0)])
    assert sv.main() == 0
    assert len(calls) == 1
    rec = json.loads(
        (tmp_path / "SCALE_RUNS.jsonl").read_text().splitlines()[-1]
    )
    assert rec["resampled"] == [] and rec["minhash"]["wall"] == 14.0

    # a FAILED adjudication re-run must still append the valid first run
    # (review r13), marked un-adjudicated — not discard it
    calls.clear()
    runs = iter([(sections(64.7), 0.3, 0), ({}, 0.0, 1)])
    assert sv.main() == 0
    assert len(calls) == 2
    rec = json.loads(
        (tmp_path / "SCALE_RUNS.jsonl").read_text().splitlines()[-1]
    )
    assert rec["resampled"] == ["minhash"] and rec["resample_failed"] is True
    assert rec["minhash"]["wall"] == 64.7  # the first run's value, kept


def test_scale_validation_widened_triggers(tmp_path, monkeypatch):
    """r14 guard widening (VERDICT r13 #2): r13's emb_lsh wall drifted
    52->85->118 s in consecutive <2x steps and evaded the 2x guard twice.
    Two new triggers close the gap: (b) two consecutive >=1.25x up-steps,
    (c) observed scaling ratio above the section's own linear model."""
    import importlib.util
    from pathlib import Path

    spec = importlib.util.spec_from_file_location(
        "scale_validation",
        Path(__file__).parent.parent / "scripts" / "scale_validation.py",
    )
    sv = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(sv)

    # (b) compound drift: each step <2x (evades the old guard), compound 2.3x
    hist = [{"emb_lsh": {"wall": 84.7}}, {"emb_lsh": {"wall": 52.1}}]
    cur = {"emb_lsh": {"wall": 118.4}}
    assert sv._suspect_sections(cur, hist) == ["emb_lsh"]
    # one up-step alone does not fire
    assert sv._suspect_sections({"emb_lsh": {"wall": 100.0}},
                                [{"emb_lsh": {"wall": 84.7}},
                                 {"emb_lsh": {"wall": 80.0}}]) == []

    # (c) ratio above the linear model fires even with flat walls
    cur = {"emb_lsh": {"wall": 50.0, "ratio": 24.0, "linear": 17.0}}
    hist = [{"emb_lsh": {"wall": 48.0}}, {"emb_lsh": {"wall": 47.0}}]
    assert sv._suspect_sections(cur, hist) == ["emb_lsh"]
    cur["emb_lsh"]["ratio"] = 12.0
    assert sv._suspect_sections(cur, hist) == []

    # (c) suppression (ADVICE r14): a section whose TRUE scaling sits above
    # the linear model reproduces the excess round over round — once the
    # PREVIOUS record shows the same excess, (c) stops firing (it would
    # otherwise double the validation wall every round forever)...
    cur = {"emb_lsh": {"wall": 50.0, "ratio": 24.0, "linear": 17.0}}
    hist_excess = [{"emb_lsh": {"wall": 48.0, "ratio": 23.0, "linear": 17.0}},
                   {"emb_lsh": {"wall": 47.0}}]
    assert sv._suspect_sections(cur, hist_excess) == []
    # ...but a FRESH excess (previous record within its model) still fires
    hist_fresh = [{"emb_lsh": {"wall": 48.0, "ratio": 15.0, "linear": 17.0}},
                  {"emb_lsh": {"wall": 47.0}}]
    assert sv._suspect_sections(cur, hist_fresh) == ["emb_lsh"]

    # no history: only (c) can fire
    assert sv._suspect_sections({"minhash": {"wall": 99.0}}, []) == []
