"""Demo of assessing a full EMMAA model.

Re-implements ``/root/reference/src/stonkgs/api/get_emmaa.py``: download an
assembled EMMAA statement dump, run ``infer_correct_binary`` over all
statements, dump a results TSV, select curation candidates from the
belief-vs-STonKGs disagreement quadrants (0.2 / 0.85 thresholds), pickle
the selected statements, and plot a scatter.
"""

from __future__ import annotations

import csv
import gzip
import json
import logging
import pickle
from pathlib import Path
from typing import List, Tuple

from stonkgs_tpu.utils.cache import ensure

logger = logging.getLogger(__name__)

MARM_URL = "https://emmaa.s3.amazonaws.com/assembled/marm_model/statements_2021-08-17-17-31-53.gz"
RAS_URL = "https://emmaa.s3.amazonaws.com/assembled/rasmachine/statements_2021-08-16-19-22-38.gz"
COVID_URL = "https://emmaa.s3.amazonaws.com/assembled/covid19/statements_2021-08-16-20-29-07.gz"
NF_URL = "https://emmaa.s3.amazonaws.com/assembled/nf/statements_2021-08-16-18-37-34.gz"
VT_URL = "https://emmaa.s3.amazonaws.com/assembled/vitiligo/statements_2021-08-17-18-38-35.gz"

BELIEF_LOWER, BELIEF_UPPER = 0.2, 0.85
STONKGS_LOWER, STONKGS_UPPER = 0.2, 0.85


def get_statements(url: str) -> Tuple[Path, List[dict]]:
    """Download + parse an EMMAA statement dump (JSON list of statements)."""
    path = ensure(url, f"demos/emmaa/{url.split('/')[-2]}")
    with gzip.open(path, "rt") as f:
        statements = json.load(f)
    return path, statements


def select_curation_candidates(df) -> set:
    """Belief-vs-model agreement quadrants (reference ``:55-63``)."""
    idx = (
        ((df.belief < BELIEF_LOWER) & (df.correct < STONKGS_LOWER))
        | ((df.belief < BELIEF_LOWER) & (df.correct > STONKGS_UPPER))
        | ((df.belief > BELIEF_UPPER) & (df.correct < STONKGS_LOWER))
        | ((df.belief > BELIEF_UPPER) & (df.correct > STONKGS_UPPER))
    )
    return set(df.loc[idx].stmt_hash.unique())


def run_emmaa_demo(url: str = VT_URL):
    """Run the EMMAA curation demo end-to-end."""
    import pandas as pd

    from stonkgs_tpu.api.api import infer_correct_binary

    statements_path, statements = get_statements(url)
    results_path = statements_path.with_suffix(".results.tsv")
    scatter_path = statements_path.with_suffix(".scatter.svg")
    curation_path = statements_path.with_suffix(".curation.pkl")

    it = iter(infer_correct_binary(statements))
    header = next(it)
    first = next(it)
    with results_path.open(mode="w") as f:
        writer = csv.writer(f, delimiter="\t")
        writer.writerow(header)
        writer.writerow(first)
        writer.writerows(it)

    # stmt_hash must stay a string: pandas would otherwise parse numeric
    # hash strings to int64 and the set membership below would never match
    df = pd.read_csv(results_path, usecols=[0, 1, 6], sep="\t",
                     dtype={"stmt_hash": str})
    curate_hashes = {str(h) for h in select_curation_candidates(df)}
    logger.info("Got %d statements for curation", len(curate_hashes))
    export = [s for s in statements
              if str(s.get("matches_hash")) in curate_hashes]
    with curation_path.open("wb") as f:
        pickle.dump(export, f)

    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        import seaborn as sns

        fig, ax = plt.subplots(1, 1)
        sns.scatterplot(data=df, x="correct", y="belief", ax=ax)
        fig.savefig(scatter_path)
    except ImportError:
        logger.warning("matplotlib/seaborn unavailable; skipping scatter plot")
    return results_path, curation_path
