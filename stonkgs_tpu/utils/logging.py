"""Experiment tracking: MLflow-compatible logger with a JSONL backend.

The reference logs params/metrics to MLflow everywhere (URIs from ``.env``,
``/root/reference/src/stonkgs/constants.py:79-84``; usage e.g.
``stonkgs_finetuning.py:453-457,484,507-511``).  MLflow isn't a hard
dependency here: if it's importable and a tracking URI is configured the
calls pass through; otherwise everything lands in a JSONL run log.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional


def _try_mlflow(tracking_uri: Optional[str]):
    if tracking_uri is None:
        return None
    try:
        import mlflow
    except ImportError:
        return None
    mlflow.set_tracking_uri(tracking_uri)
    return mlflow


class RunLogger:
    """Per-run logger: params, step metrics; JSONL + optional MLflow."""

    def __init__(
        self,
        log_dir: Optional[str] = None,
        experiment: str = "default",
        run_name: Optional[str] = None,
        tracking_uri: Optional[str] = None,
        stdout: bool = True,
    ):
        self.experiment = experiment
        self.run_name = run_name or time.strftime("%Y%m%d-%H%M%S")
        self.stdout = stdout
        self._fh = None
        if log_dir:
            os.makedirs(log_dir, exist_ok=True)
            path = os.path.join(log_dir, f"{experiment}-{self.run_name}.jsonl")
            self._fh = open(path, "a")
        self._mlflow = _try_mlflow(tracking_uri)
        if self._mlflow is not None:
            self._mlflow.set_experiment(experiment)
            self._mlflow.start_run(run_name=self.run_name)

    def _emit(self, record: Dict[str, Any]):
        record["ts"] = time.time()
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        if self.stdout:
            print(json.dumps(record), flush=True)

    def log_param(self, key: str, value: Any):
        """Record a run parameter (mirrors mlflow.log_param)."""
        self._emit({"type": "param", "key": key, "value": str(value)})
        if self._mlflow is not None:
            self._mlflow.log_param(key, value)

    def log_metric(self, key: str, value: float, step: Optional[int] = None):
        """Record one metric value at a step."""
        self._emit({"type": "metric", "key": key, "value": float(value),
                    "step": step})
        if self._mlflow is not None:
            self._mlflow.log_metric(key, value, step=step)

    def log_metrics(self, metrics: Dict[str, float], step: Optional[int] = None):
        """Record a dict of metrics at a step."""
        for k, v in metrics.items():
            self.log_metric(k, v, step)

    def close(self):
        """Flush and close the JSONL sink (and MLflow run if active)."""
        if self._fh:
            self._fh.close()
        if self._mlflow is not None:
            self._mlflow.end_run()

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()
