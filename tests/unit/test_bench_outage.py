"""Outage contract of the driver bench (bench.py).

Round-4 postmortem: the axon tunnel wedged at driver time and the bench
spent its whole budget running configs against a server its own probe had
declared dead, nulling the round's record.  The contract now is:

  * a probe that never goes green costs SECONDS: the parent emits the full
    headline JSON immediately with ``backend_down: true`` and last-good
    values merged in, tagged ``*_stale`` with their provenance;
  * BENCH_LASTGOOD.json is refreshed key-by-key by healthy runs, so a
    partial run never erases a config measured earlier.

These tests simulate the wedged backend by overriding the probe command
(MFTPU_BENCH_PROBE_CMD) — no jax, no TPU, pure subprocess/JSON logic.
"""
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
BENCH = os.path.join(REPO, "bench.py")

sys.path.insert(0, REPO)


def _run_bench(env_extra, timeout=90):
    env = dict(os.environ)
    env.update(env_extra)
    return subprocess.run([sys.executable, BENCH], capture_output=True,
                          text=True, timeout=timeout, env=env, cwd=REPO)


def _last_json(stdout):
    lines = [ln for ln in stdout.splitlines() if ln.startswith("{")]
    assert lines, f"no JSON line in stdout: {stdout!r}"
    return json.loads(lines[-1])


@pytest.fixture
def lastgood(tmp_path):
    p = tmp_path / "lastgood.json"
    p.write_text(json.dumps({
        "commit": "abc1234",
        "updated": "2026-08-19 22:30 UTC",
        "configs": {
            "gpr_T1e6_f32_ms": 2.161,
            "gpr_engine": "pallas-uniform",
            "cvi_T1e6_f32_ms": 8.727,
            "loss": -168793.09,
        },
    }))
    return str(p)


def test_wedged_backend_emits_stale_record_fast(lastgood):
    """A dead probe must yield a complete stale-tagged record within the
    (tiny) budget — not a null record after burning every timebox."""
    res = _run_bench({
        "MFTPU_BENCH_PROBE_CMD": "false",  # probe fails instantly
        "MFTPU_BENCH_BUDGET_S": "10",
        "MFTPU_BENCH_LASTGOOD": lastgood,
    }, timeout=60)
    assert res.returncode == 0, res.stderr[-1000:]
    line = _last_json(res.stdout)
    assert line["backend_down"] is True
    assert line["stale"] is True
    # the headline value is the last-good number, not null
    assert line["value"] == 2.161
    assert line["vs_baseline"] == pytest.approx(50.0 / 2.161, rel=1e-2)
    cfg = line["configs"]
    assert cfg["gpr_T1e6_f32_ms"] == 2.161
    assert cfg["cvi_T1e6_f32_ms"] == 8.727
    # every borrowed number carries its provenance
    assert "abc1234" in cfg["gpr_T1e6_f32_stale"]
    assert "abc1234" in cfg["cvi_T1e6_f32_stale"]
    assert line["loss"] == -168793.09


def test_wedged_backend_without_lastgood_still_emits(tmp_path):
    res = _run_bench({
        "MFTPU_BENCH_PROBE_CMD": "false",
        "MFTPU_BENCH_BUDGET_S": "10",
        "MFTPU_BENCH_LASTGOOD": str(tmp_path / "missing.json"),
    }, timeout=60)
    assert res.returncode == 0, res.stderr[-1000:]
    line = _last_json(res.stdout)
    assert line["backend_down"] is True
    assert line["value"] is None  # honest: nothing to borrow


def test_hung_probe_respects_its_timeout(lastgood):
    """A probe that HANGS (the observed failure mode: work RPCs never
    return) must be cut off by the subprocess timeout, still in budget."""
    res = _run_bench({
        "MFTPU_BENCH_PROBE_CMD": "sleep 999",
        "MFTPU_BENCH_BUDGET_S": "8",
        "MFTPU_BENCH_LASTGOOD": lastgood,
    }, timeout=80)
    assert res.returncode == 0, res.stderr[-1000:]
    line = _last_json(res.stdout)
    assert line["backend_down"] is True
    assert line["value"] == 2.161


def test_update_lastgood_merges_key_by_key(tmp_path, monkeypatch):
    """A later partial run must not erase configs measured by an earlier
    full run; fresh values overwrite, status strings never land."""
    import importlib

    p = tmp_path / "lg.json"
    monkeypatch.setenv("MFTPU_BENCH_LASTGOOD", str(p))
    import bench
    importlib.reload(bench)
    bench._update_lastgood({"gpr_T1e6_f32_ms": 2.0, "gpr_engine": "pallas",
                            "loss": -1.0, "vgp_status": "timeout"})
    bench._update_lastgood({"sde_doublewell_n16384_f32_ms": 1.5,
                            "sde_protocol": "slope-k1-k8"})
    rec = json.loads(p.read_text())
    assert rec["configs"]["gpr_T1e6_f32_ms"] == 2.0
    assert rec["configs"]["sde_doublewell_n16384_f32_ms"] == 1.5
    assert "vgp_status" not in rec["configs"]
    # merge fills only what's missing, with provenance tags
    merged = bench._merge_stale({"gpr_T1e6_f32_ms": 3.0})
    assert merged["gpr_T1e6_f32_ms"] == 3.0  # fresh wins
    assert "gpr_T1e6_f32_stale" not in merged
    assert merged["sde_doublewell_n16384_f32_ms"] == 1.5
    assert "last-good" in merged["sde_doublewell_n16384_f32_stale"]
    # a run with only status strings must not touch the file
    before = p.read_text()
    bench._update_lastgood({"svgp_status": "skipped"})
    assert p.read_text() == before


def test_update_lastgood_keeps_slope_over_upper_bound(tmp_path, monkeypatch):
    """A harvested single-step upper bound must not overwrite a completed
    slope measurement from an earlier run (observed live: a 24.9 ms sde
    upper bound clobbered the 1.536 ms slope value)."""
    import importlib
    import json as _json

    p = tmp_path / "lg.json"
    monkeypatch.setenv("MFTPU_BENCH_LASTGOOD", str(p))
    import bench
    importlib.reload(bench)
    bench._update_lastgood({"sde_doublewell_n16384_f32_ms": 1.5,
                            "sde_protocol": "slope-k1-k8"})
    bench._update_lastgood({"sde_doublewell_n16384_f32_ms": 24.9,
                            "sde_protocol": "single-step-upper-bound"})
    rec = _json.loads(p.read_text())
    assert rec["configs"]["sde_doublewell_n16384_f32_ms"] == 1.5
    assert rec["configs"]["sde_protocol"] == "slope-k1-k8"
    # ... but a better slope value DOES refresh
    bench._update_lastgood({"sde_doublewell_n16384_f32_ms": 1.2,
                            "sde_protocol": "slope-k1-k8"})
    rec = _json.loads(p.read_text())
    assert rec["configs"]["sde_doublewell_n16384_f32_ms"] == 1.2
