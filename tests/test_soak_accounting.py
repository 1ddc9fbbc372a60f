"""Pin the soak harness's rate/checkpoint accounting on synthetic series.

The real soaks (``benchmarks/soak_pretrain.py``, PERF.md round 3) run for
minutes on the real chip; this test pins the *math* that turns their
metrics JSONL into the published numbers — median inter-log rate, the
save-interval exclusion, the checkpoint-cost recovery, and the resume
seam — hermetically, so a refactor can't silently change what the soak
reports.  Reference equivalent of the flow under test: HF Trainer
``get_last_checkpoint`` auto-resume
(``/root/reference/src/stonkgs/models/stonkgs_pretraining.py:195-212``).
"""

import importlib.util
import json
import sys
from pathlib import Path

import pytest

_PATH = Path(__file__).resolve().parents[1] / "benchmarks" / "soak_pretrain.py"
_spec = importlib.util.spec_from_file_location("soak_pretrain", _PATH)
soak = importlib.util.module_from_spec(_spec)
sys.modules.setdefault("soak_pretrain", soak)
_spec.loader.exec_module(soak)


def _series(rate=160.0, batch=32, log_every=25, steps=400, save_steps=100,
            save_cost=20.0, restart_after=None, restart_cost=120.0,
            loss0=10.0, dloss=0.01):
    """step -> {loss, _ts} with a constant true rate and known save cost."""
    series, ts = {}, 1000.0
    prev = 0
    for i, s in enumerate(range(log_every, steps + 1, log_every)):
        dt = (s - prev) * batch / rate
        if (s // save_steps) > (prev // save_steps):
            dt += save_cost
        if restart_after is not None and prev == restart_after:
            dt += restart_cost  # kill + relaunch + re-compile wall time
        ts += dt
        series[s] = {"loss": loss0 - dloss * i, "_ts": ts}
        prev = s
    return series


def test_sustained_is_the_true_rate_and_ckpt_cost_recovered():
    v = soak.compute_verdicts(_series(), killed_at=100, save_steps=100,
                              batch_size=32)
    assert v["sustained"] == pytest.approx(160.0)
    # save intervals are excluded from the rate and their extra wall time
    # is recovered as the checkpoint cost
    assert v["ckpt_cost"] == pytest.approx(20.0, abs=1e-6)
    assert v["phase2_first"] == 125
    assert v["last_loss"] < v["first_loss"]


def test_restart_outlier_does_not_shift_the_median():
    # the interval spanning the SIGKILL+relaunch contains minutes of
    # non-training wall time; the median rate must not move
    v = soak.compute_verdicts(
        _series(restart_after=100, restart_cost=300.0),
        killed_at=100, save_steps=100, batch_size=32)
    assert v["sustained"] == pytest.approx(160.0)


def test_degenerate_series_raises_or_returns_none():
    with pytest.raises(AssertionError):
        soak.compute_verdicts({}, killed_at=0, save_steps=100, batch_size=32)
    # a single log row has no intervals: no rate, no checkpoint cost
    v = soak.compute_verdicts({25: {"loss": 1.0, "_ts": 5.0}}, killed_at=0,
                              save_steps=100, batch_size=32)
    assert v["sustained"] is None and v["ckpt_cost"] is None
    # rows without timestamps contribute to the loss curve only
    v = soak.compute_verdicts(
        {25: {"loss": 2.0}, 50: {"loss": 1.0}}, killed_at=0,
        save_steps=100, batch_size=32)
    assert v["sustained"] is None
    assert v["loss_curve"] == [[25, 2.0], [50, 1.0]]


def test_read_metrics_merges_runs_and_skips_junk(tmp_path):
    # phase-1 and phase-2 RunLogger files plus junk lines; overlapping
    # steps keep the max timestamp (the later run's row wins the seam)
    (tmp_path / "run1.jsonl").write_text("\n".join([
        json.dumps({"type": "metric", "step": 25, "key": "loss",
                    "value": 3.0, "ts": 10.0}),
        "not json",
        json.dumps({"type": "config", "step": None}),
        json.dumps({"type": "metric", "step": 50, "key": "loss",
                    "value": 2.5, "ts": 20.0}),
    ]) + "\n")
    (tmp_path / "run2.jsonl").write_text(json.dumps(
        {"type": "metric", "step": 50, "key": "loss",
         "value": 2.4, "ts": 99.0}) + "\n")
    series = soak._read_metrics(str(tmp_path))
    assert set(series) == {25, 50}
    assert series[50]["loss"] == 2.4
    assert series[50]["_ts"] == 99.0
