"""Unit tests for bench.py's window-estimate and annotation logic —
the code that turns raw chain walls into the driver-recorded headline
(the round-5 CSE discovery made this the most safety-critical path of
the artifact pipeline)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def test_differential_from_two_chain_lengths():
    wins = ([{"n": 8, "dt": 0.060}] * 3
            + [{"n": 16, "dt": 0.084}] * 3)
    per_call, method, med, spread = bench._window_estimate(wins, 8192)
    assert method == "chain-differential"
    assert per_call == pytest.approx((0.084 - 0.060) / 8)
    assert med == {8: 0.060, 16: 0.084}


def test_absorber_windows_excluded():
    wins = ([{"n": 8, "dt": 9.0, "absorber": True}]
            + [{"n": 8, "dt": 0.060}] * 3
            + [{"n": 16, "dt": 0.084}] * 3)
    per_call, method, _, _ = bench._window_estimate(wins, 8192)
    assert method == "chain-differential"
    assert per_call == pytest.approx(0.003)


def test_degenerate_differential_falls_back_to_naive():
    # weather spike in the x8 median makes the differential negative
    wins = ([{"n": 8, "dt": 0.100}] * 3
            + [{"n": 16, "dt": 0.090}] * 3)
    per_call, method, _, _ = bench._window_estimate(wins, 8192)
    assert method.startswith("chain-naive")
    assert per_call == pytest.approx(0.090 / 16)


def test_single_chain_length_is_naive():
    wins = [{"n": 8, "dt": 0.060}] * 2
    per_call, method, _, _ = bench._window_estimate(wins, 8192)
    assert method == "chain-naive"
    assert per_call == pytest.approx(0.060 / 8)


def test_absorber_only_uses_eager_floor():
    wins = [{"n": 8, "dt": 9.0, "absorber": True}]
    per_call, method, _, _ = bench._window_estimate(wins, 8192)
    assert method == "eager-floor"
    assert per_call == pytest.approx(9.0 / 8)


def test_legacy_eager_windows():
    wins = [{"iters": 8, "dt": 0.08}, {"iters": 32, "dt": 0.20}]
    per_call, method, _, spread = bench._window_estimate(wins, 8192)
    assert method == "eager-floor"
    assert per_call == pytest.approx(0.20 / 32)


def test_spread_annotations():
    out = {"cfg7_spread": 0.4,
           "cfg7_stages_ms": {"fetch": 150.0, "build": 30.0},
           "cfg2_spread": 0.3,
           "cfg3_spread": 0.05}
    bench._annotate_spreads(out)
    assert "fetch-stage dominated" in out["cfg7_spread_cause"]
    assert "blocking-RTT variance" in out["cfg2_spread_cause"]
    assert "cfg3_spread_cause" not in out


def test_last_tpu_record_prefers_complete(tmp_path, monkeypatch):
    hist = tmp_path / "h.jsonl"
    hist.write_text(
        '{"run": "a", "aln_per_sec": 2500000, "ts": 1, '
        '"e2e": {"cfg7_stream_e2e_aln_per_sec": 50000}}\n'
        '{"run": "b", "aln_per_sec": 9000, "ts": 2, "e2e": null}\n')
    monkeypatch.setattr(bench, "HISTORY", str(hist))
    rec = bench._last_tpu_record()
    assert rec["run"] == "a"  # sparse absorber-only record skipped
