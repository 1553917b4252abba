"""bench.py's round-over-round regression gate (r5).

The r04 artifact shipped a silent trace-throughput drop; the gate makes
that class of drift name itself in the JSON line. These tests pin the
gate's contract without touching a device: metric direction handling,
the >5% threshold, the redefined-metric skip, and artifact discovery.
"""

import json
import os
import sys

_REPO_ROOT = os.path.dirname(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

import bench  # noqa: E402


def test_metric_directions():
    assert bench._metric_direction("value") == "lower"
    assert bench._metric_direction("fhd_trace_ms") == "lower"
    assert bench._metric_direction("gather_ns_per_index") == "lower"
    assert bench._metric_direction("sd_video_fps") == "higher"
    assert bench._metric_direction("sd_video_steady_fps") == "higher"
    assert bench._metric_direction("mray_steps_per_s_aa") == "higher"
    assert bench._metric_direction("vpu_issue_util") == "higher"
    assert bench._metric_direction("vs_baseline") == "higher"
    assert bench._metric_direction("e2e_golden") is None
    assert bench._metric_direction("metric") is None


def test_regression_check_flags_and_skips(monkeypatch):
    prev = {
        "round": bench.REDEFINED_IN_ROUND - 1,  # pre-recalibration round
        "metrics": {
            "value": 50.0,              # ms, lower-better
            "fhd_trace_ms": 16.0,
            "sd_video_fps": 14.0,       # higher-better
            "vpu_issue_util": 0.70,     # redefined -> skipped vs r4
            "sd_frame_ms": "error: x",  # non-numeric -> skipped
            "e2e_golden": {"aa": True},
        },
    }
    monkeypatch.setattr(bench, "_load_prev_artifact", lambda: prev)
    monkeypatch.setitem(
        bench.REDEFINED_METRICS, "vpu_issue_util", "recalibrated")
    result = {
        "value": 56.0,            # +12% worse -> flagged
        "fhd_trace_ms": 16.4,     # +2.5% -> within tolerance
        "sd_video_fps": 10.0,     # -29% worse -> flagged
        "vpu_issue_util": 0.40,   # would be worse, but redefined
        "sd_frame_ms": 7.0,
    }
    bench._regression_check(result)
    assert result["vs_prev_round"] == prev["round"]
    flagged = result["regressions"]
    assert set(flagged) == {"value", "sd_video_fps"}
    assert flagged["value"]["worse_pct"] == 12.0
    assert result["metric_notes"]["vpu_issue_util"] == "recalibrated"


def test_redefined_skip_expires_after_recalibration_round(monkeypatch):
    """The definitional skip covers only comparisons against
    pre-recalibration artifacts — from the next round on, a real
    vpu_* drop must be flagged again (a permanent skip would reopen
    the silent-drift hole the gate closes)."""
    prev = {
        "round": bench.REDEFINED_IN_ROUND,  # post-recalibration artifact
        "metrics": {"vpu_issue_util": 0.61},
    }
    monkeypatch.setattr(bench, "_load_prev_artifact", lambda: prev)
    result = {"vpu_issue_util": 0.50}  # -18%: real drift, same definition
    bench._regression_check(result)
    assert "vpu_issue_util" in result.get("regressions", {})
    assert "metric_notes" not in result


def test_regression_check_improvements_silent(monkeypatch):
    prev = {"round": 3, "metrics": {"value": 60.0, "sd_video_fps": 10.0}}
    monkeypatch.setattr(bench, "_load_prev_artifact", lambda: prev)
    result = {"value": 55.0, "sd_video_fps": 14.0}
    bench._regression_check(result)
    assert "regressions" not in result


def test_load_prev_artifact_picks_latest(tmp_path, monkeypatch):
    for n, ms in ((3, 60.0), (4, 58.0)):
        (tmp_path / f"BENCH_r{n:02d}.json").write_text(
            json.dumps({"parsed": {"metric": "m", "value": ms}})
        )
    (tmp_path / "BENCH_rXX.json").write_text("not json")
    # Point discovery at the temp dir: _load_prev_artifact resolves
    # bench.__file__'s directory at call time.
    monkeypatch.setattr(bench, "__file__", str(tmp_path / "bench.py"))
    prev = bench._load_prev_artifact()
    assert prev["round"] == 4
    assert prev["metrics"]["value"] == 58.0


def test_retry_flagged_self_heals_glitch(monkeypatch):
    """A flagged metric whose re-measure lands back on the plateau
    drops out of 'regressions'; the artifact records the retry."""
    prev = {"round": 7, "metrics": {"v2_frame_ms": 49.0,
                                    "sd_frame_ms": 7.3}}
    monkeypatch.setattr(bench, "_load_prev_artifact", lambda: prev)
    result = {"v2_frame_ms": 62.0, "sd_frame_ms": 7.4}
    bench._regression_check(result)
    assert "v2_frame_ms" in result["regressions"]

    def rerun(key, fn):
        result[key] = fn()

    bench._retry_flagged(result, {"v2_frame_ms": lambda: 49.2}, rerun)
    assert result["retried"] == ["v2_frame_ms"]
    assert "regressions" not in result
    assert result["v2_frame_ms"] == 49.2


def test_retry_flagged_true_regression_stays(monkeypatch):
    """A regression that reproduces on the re-measure stays flagged."""
    prev = {"round": 7, "metrics": {"v2_frame_ms": 49.0}}
    monkeypatch.setattr(bench, "_load_prev_artifact", lambda: prev)
    result = {"v2_frame_ms": 62.0}
    bench._regression_check(result)

    def rerun(key, fn):
        result[key] = fn()

    bench._retry_flagged(result, {"v2_frame_ms": lambda: 61.5}, rerun)
    assert result["retried"] == ["v2_frame_ms"]
    assert result["regressions"]["v2_frame_ms"]["now"] == 61.5


def test_retry_flagged_maps_submetrics_to_parent_aux(monkeypatch):
    """mray/vpu sub-metrics re-run their producing trace aux once,
    not per flagged key; the headline (no registered fn) is skipped."""
    prev = {"round": 7, "metrics": {
        "value": 50.0, "mray_steps_per_s": 9200.0, "vpu_mfu": 0.47}}
    monkeypatch.setattr(bench, "_load_prev_artifact", lambda: prev)
    result = {"value": 60.0, "mray_steps_per_s": 8000.0, "vpu_mfu": 0.40}
    bench._regression_check(result)
    assert set(result["regressions"]) == {
        "value", "mray_steps_per_s", "vpu_mfu"}
    calls = []

    def trace_fn():
        result["mray_steps_per_s"] = 9250.0
        result["vpu_mfu"] = 0.472
        return 16.2

    def rerun(key, fn):
        calls.append(key)
        result[key] = fn()

    bench._retry_flagged(result, {"fhd_trace_ms": trace_fn}, rerun)
    assert calls == ["fhd_trace_ms"]  # one re-run for both sub-metrics
    # value had no fn -> still flagged; trace metrics healed.
    assert set(result["regressions"]) == {"value"}
