"""RunLogger + remaining CLI subcommand smoke tests."""

import json
import os

import numpy as np
import pandas as pd
import pytest


def test_run_logger_jsonl(tmp_path):
    from stonkgs_tpu.utils.logging import RunLogger

    with RunLogger(log_dir=str(tmp_path), experiment="exp",
                   run_name="r1", stdout=False) as log:
        log.log_param("lr", 1e-4)
        log.log_metric("loss", 2.5, step=10)
        log.log_metrics({"a": 1.0, "b": 2.0}, step=11)
    files = [f for f in os.listdir(tmp_path) if f.endswith(".jsonl")]
    assert files == ["exp-r1.jsonl"]
    records = [json.loads(l) for l in open(tmp_path / files[0])]
    kinds = [(r["type"], r["key"]) for r in records]
    assert ("param", "lr") in kinds
    assert ("metric", "loss") in kinds
    loss = next(r for r in records if r["key"] == "loss")
    assert loss["step"] == 10 and loss["value"] == 2.5


def test_cli_node2vec_command(tmp_path):
    from click.testing import CliRunner

    from stonkgs_tpu.cli import main

    n = 30
    pd.DataFrame({
        "source": [f"n{i}" for i in range(n)],
        "target": [f"n{(i + 1) % n}" for i in range(n)],
    }).to_csv(tmp_path / "triples.tsv", sep="\t", index=False)
    result = CliRunner().invoke(main, [
        "node2vec",
        "--pretraining_path", str(tmp_path / "triples.tsv"),
        "--dimensions", "8", "--walk_length", "5", "--epochs", "2",
        "--output_dir", str(tmp_path),
    ])
    assert result.exit_code == 0, result.output
    assert (tmp_path / "embeddings_best_model.tsv").exists()
    assert (tmp_path / "random_walks_best_model.tsv").exists()


def test_cli_extract_command(tmp_path):
    from click.testing import CliRunner

    from stonkgs_tpu.cli import main

    stmts = [{"type": "Association",
              "subj": {"name": "A", "db_refs": {"HGNC": "1"}},
              "obj": {"name": "B", "db_refs": {"HGNC": "2"}},
              "belief": 0.5,
              "evidence": [{"text": "A relates to B.", "pmid": "1"}]}]
    raw = tmp_path / "stmts.jsonl"
    raw.write_text("\n".join(json.dumps(s) for s in stmts) + "\n")
    result = CliRunner().invoke(main, [
        "extract", "--path", str(raw),
        "--output_dir", str(tmp_path / "out"),
    ])
    assert result.exit_code == 0, result.output
    pre = pd.read_csv(tmp_path / "out" / "pretraining" /
                      "pretraining_triples.tsv", sep="\t")
    assert len(pre) == 1
