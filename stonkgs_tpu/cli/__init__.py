"""Command line interface for :mod:`stonkgs_tpu`.

Extends the reference's bare click group (``src/stonkgs/cli.py``) with
actual subcommands for every runnable module main: pre-training,
fine-tuning, node2vec, INDRA extraction, embedding extraction, and the
benchmark.  Console script: ``stonkgs-tpu`` (pyproject.toml).
"""

import logging

import click

__all__ = ["main"]

logger = logging.getLogger(__name__)


@click.group()
@click.version_option(version="dev", prog_name="stonkgs-tpu",
                      message="%(prog)s (dev)")
def main():
    """TPU-native STonKGs framework CLI."""


@main.command()
@click.option("--dataset", "dataset_path", required=True,
              help="Preprocessed pre-training features (.pkl or .tsv)")
@click.option("--variant",
              type=click.Choice(["stonkgs", "transe", "prot"]),
              default="stonkgs")
@click.option("--kg-embedding-path", default=None,
              help="node2vec embeddings TSV (builds the KG backbone)")
@click.option("--lm-checkpoint", default=None,
              help="HF BioBERT checkpoint dir for the frozen backbone")
@click.option("--vocab-file", default=None,
              help="tokenizer vocab.txt (sets the text vocab size)")
@click.option("--batch_size", default=8, type=int)
@click.option("--lr", default=1e-4, type=float)
@click.option("--max_steps", default=200, type=int)
@click.option("--gradient_accumulation_steps", default=1, type=int)
@click.option("--save_steps", default=5000, type=int)
@click.option("--save_total_limit", default=5, type=int)
@click.option("--output_dir", default="stonkgs-pretraining", type=str)
@click.option("--n_model_shards", default=1, type=int,
              help="model-axis size (shards KG table + decoders)")
@click.option("--compute_dtype", default="bfloat16", type=str)
@click.option("--remat", default="auto",
              type=click.Choice(["auto", "none", "full", "attention"]),
              help="trunk rematerialization: full layers, attention-only "
                   "(selective), or none; auto = the fastest measured mode "
                   "for the backend (PERF.md)")
@click.option("--attention", "attention_impl", default="auto",
              type=click.Choice(["auto", "xla", "flash"]),
              help="attention implementation; flash = Pallas custom-VJP "
                   "kernel with in-kernel dropout (auto = flash on TPU)")
@click.option("--export_hf_dir", default=None, type=str,
              help="export the final model as an HF checkpoint directory")
@click.option("--frozen_bf16/--no-frozen_bf16", default=True,
              help="store the frozen backbones in bf16 (halves their HBM)")
@click.option("--fsdp/--no-fsdp", default=False,
              help="fully shard params/grads/optimizer over the data axis "
                   "(ZeRO-3 equivalent; needs a multi-device mesh)")
@click.option("--log_steps", default=100, type=int)
@click.option("--num_hidden_layers", default=None, type=int,
              help="override trunk depth (smoke runs; default 12 at h=768)")
@click.option("--local_rank", default=-1, type=int,
              help="THIS PARAMETER IS IGNORED")
def pretrain(**kw):
    """Run STonKGs pre-training (reference stonkgs_pretraining.py CLI)."""
    from stonkgs_tpu.cli.pretrain import run_pretraining

    run_pretraining(**kw)


@main.command()
@click.option("--train_data_path", required=True, type=str)
@click.option("--model_path", required=True, help="Pretrained checkpoint dir")
@click.option("--kg-embedding-path", required=True, type=str)
@click.option("--kg-walks-path", required=True, type=str)
@click.option("--vocab-file", required=True, type=str)
@click.option("--class_column_name", default="class", type=str)
@click.option("-e", "--epochs", default=5, type=int)
@click.option("--cv", default=5, type=int)
@click.option("--lr", default=5e-5, type=float)
@click.option("--batch_size", default=8, type=int)
@click.option("--max_dataset_size", default=100000, type=int)
@click.option("--output_dir", default="stonkgs-finetuning", type=str)
@click.option("--task_name", default="", type=str)
def finetune(**kw):
    """Cross-validated fine-tuning on one task TSV."""
    from stonkgs_tpu.cli.finetune import run_finetuning

    run_finetuning(**kw)


@main.command("finetune-all")
@click.option("--input_dir", required=True,
              help="directory with the per-task *_ppi_prot.tsv files")
@click.option("--model_path", required=True, type=str)
@click.option("--kg-embedding-path", required=True, type=str)
@click.option("--kg-walks-path", required=True, type=str)
@click.option("--vocab-file", required=True, type=str)
@click.option("-e", "--epochs", default=5, type=int)
@click.option("--cv", default=5, type=int)
@click.option("--lr", default=5e-5, type=float)
@click.option("--batch_size", default=8, type=int)
@click.option("--max_dataset_size", default=100000, type=int)
@click.option("--output_dir", default="stonkgs-finetuning", type=str)
def finetune_all(input_dir, **kw):
    """Run the full 10-task fine-tuning battery
    (reference run_all_fine_tuning_tasks)."""
    from stonkgs_tpu.cli.finetune import run_all_fine_tuning_tasks

    results = run_all_fine_tuning_tasks(input_dir, **kw)
    for task, res in results.items():
        click.echo(f"{task}: f1 {res['f1_score_mean']:.4f} "
                   f"± {res['f1_score_std']:.4f}")


@main.command()
@click.option("--pretraining_path", required=True, type=str)
@click.option("--sep", default="\t", type=str)
@click.option("--n_threads", default=None, type=int)
@click.option("--dimensions", default=768, type=int)
@click.option("--walk_length", default=127, type=int)
@click.option("--epochs", default=4, type=int)
@click.option("--window_size", default=3, type=int)
@click.option("--embeddings_output_path", default=None, type=str)
@click.option("--random_walks_output_path", default=None, type=str)
@click.option("--output_dir", default=".", type=str)
@click.option("--device_pipeline", is_flag=True, default=False,
              help="fully on-device SGNS stage (no host pair feed)")
def node2vec(**kw):
    """Train node2vec KG embeddings (reference node2vec.py CLI)."""
    from stonkgs_tpu.models.node2vec import run_node2vec

    run_node2vec(**kw)


@main.command("node2vec-hpo")
@click.option("--pretraining_path", required=True, type=str)
@click.option("--n_trials", default=1, type=int)
@click.option("--seed", default=0, type=int)
@click.option("--output_dir", default=".", type=str)
def node2vec_hpo(**kw):
    """node2vec HPO via link prediction (reference run_node2vec_hpo)."""
    from stonkgs_tpu.models.node2vec import run_node2vec_hpo

    result = run_node2vec_hpo(**kw)
    click.echo(str(result))


@main.command()
@click.option("--pretraining_path", required=True,
              help="pretraining_triples.tsv (source/target/evidence columns)")
@click.option("--kg-embedding-path", required=True, type=str)
@click.option("--kg-walks-path", required=True, type=str)
@click.option("--vocab-file", required=True, type=str)
@click.option("--variant", type=click.Choice(["stonkgs", "transe"]),
              default="stonkgs")
@click.option("--nsp_negative_proportion", default=0.25, type=float)
@click.option("--seed", default=0, type=int)
@click.option("--output", "output_path", required=True,
              help="output .pkl of preprocessed features")
def preprocess(pretraining_path, kg_embedding_path, kg_walks_path,
               vocab_file, variant, nsp_negative_proportion, seed,
               output_path):
    """Preprocess pre-training triples into model features
    (reference indra_for_pretraining / transe_indra_for_pretraining)."""
    import pandas as pd

    from stonkgs_tpu.data.fast_tokenizer import FastBertTokenizer

    df = pd.read_csv(pretraining_path, sep="\t")
    tokenizer = FastBertTokenizer(vocab_file)
    if variant == "transe":
        from stonkgs_tpu.data.transe import (
            load_transe_artifacts, preprocess_transe_for_pretraining,
        )

        artifacts = load_transe_artifacts(kg_embedding_path)
        feats, skips = preprocess_transe_for_pretraining(
            df["source"].tolist(), df["relation"].tolist(),
            df["target"].tolist(), df["evidence"].tolist(),
            artifacts, tokenizer,
            nsp_negative_proportion=nsp_negative_proportion, seed=seed)
        click.echo(f"{skips} many examples were skipped")
    else:
        from stonkgs_tpu.data.artifacts import load_kg_artifacts
        from stonkgs_tpu.data.preprocessing import preprocess_for_pretraining

        artifacts = load_kg_artifacts(kg_embedding_path, kg_walks_path)
        feats = preprocess_for_pretraining(
            df["source"].to_numpy(object), df["target"].to_numpy(object),
            df["evidence"].tolist(), artifacts, tokenizer,
            nsp_negative_proportion=nsp_negative_proportion, seed=seed)
    pd.DataFrame({k: list(v) for k, v in feats.items()}).to_pickle(output_path)
    click.echo(f"wrote {len(feats['input_ids'])} examples to {output_path}")


@main.command()
@click.option("--path", required=True, help="INDRA statements JSON-lines")
@click.option("--output_dir", required=True, type=str)
def extract(path, output_dir):
    """Extract the INDRA KG into task TSVs (reference indra_extraction)."""
    from stonkgs_tpu.data.indra_extraction import read_indra_triples

    out = read_indra_triples(path, output_dir)
    for k, v in out.items():
        click.echo(f"{k}: {v}")


@main.command()
@click.option("--input", "input_path", required=True,
              help="TSV with source/target/evidence columns")
@click.option("--model_path", required=True, type=str)
@click.option("--kg-embedding-path", required=True, type=str)
@click.option("--kg-walks-path", required=True, type=str)
@click.option("--vocab-file", required=True, type=str)
@click.option("--output", "output_path", required=True, type=str)
@click.option("--batch_size", default=64, type=int)
@click.option("--no-masking", is_flag=True, default=False,
              help="disable the reference's inference-time masking quirk")
def embed(input_path, model_path, kg_embedding_path, kg_walks_path,
          vocab_file, output_path, batch_size, no_masking):
    """Extract pooled embeddings for text-triple pairs (README flow)."""
    import pandas as pd

    from stonkgs_tpu.api.inference import STonKGsEngine

    df = pd.read_csv(input_path, sep="\t")
    engine = STonKGsEngine.from_pretrained(
        model_path, kg_embedding_path, kg_walks_path,
        vocab_file=vocab_file, batch_size=batch_size,
    )
    feats = engine.preprocess(
        df["source"].to_numpy(object), df["target"].to_numpy(object),
        df["evidence"].tolist(), apply_masking=not no_masking,
    )
    emb = engine.embed(feats)
    out = pd.DataFrame({"embedding": [row.tolist() for row in emb]})
    out.to_csv(output_path, sep="\t", index=False)
    click.echo(f"wrote {len(out)} embeddings to {output_path}")


@main.command("verify-parity")
@click.option("--model_path", required=True, type=str)
@click.option("--kg-embedding-path", required=True, type=str)
@click.option("--kg-walks-path", required=True, type=str)
@click.option("--n_rows", default=8, type=int)
@click.option("--tolerance", default=1e-5, type=float)
def verify_parity_cmd(model_path, kg_embedding_path, kg_walks_path, n_rows,
                      tolerance):
    """Compare this framework against a torch execution of a checkpoint."""
    from stonkgs_tpu.utils.parity import verify_parity

    report = verify_parity(model_path, kg_embedding_path, kg_walks_path,
                           n_rows=n_rows)
    click.echo(report.summary(tolerance))
    if report.max_dev >= tolerance:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
