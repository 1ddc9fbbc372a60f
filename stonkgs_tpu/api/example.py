"""Full example of how to use a fine-tuned model.

Run with: ``python -m stonkgs_tpu.api.example``
(reference: ``src/stonkgs/api/example.py``).
"""

from __future__ import annotations

from stonkgs_tpu.constants import HOME

SPECIES_PREDICTION_PATH = HOME / "species" / "predictions.tsv"

EXAMPLE_ROWS = [
    [
        "p(HGNC:1748 ! CDH1)",
        "p(HGNC:2515 ! CTNND1)",
        "Some example sentence about CDH1 and CTNND1.",
    ],
    [
        "p(HGNC:6871 ! MAPK1)",
        "p(HGNC:6018 ! IL6)",
        "Another example about some interaction between MAPK and IL6.",
    ],
    [
        "p(HGNC:3229 ! EGF)",
        "p(HGNC:4066 ! GAB1)",
        "One last example in which Gab1 and EGF are mentioned.",
    ],
]


def main():
    """Apply the species model to the README example rows."""
    import csv

    from stonkgs_tpu.api.api import infer_species

    SPECIES_PREDICTION_PATH.parent.mkdir(parents=True, exist_ok=True)
    rows = iter(infer_species(EXAMPLE_ROWS))
    with open(SPECIES_PREDICTION_PATH, "w") as f:
        writer = csv.writer(f, delimiter="\t")
        for row in rows:
            writer.writerow(row)
    print(f"Results at {SPECIES_PREDICTION_PATH}")

    # optional: text processing round trip through INDRA REACH, if installed
    try:
        from indra.sources import reach

        statements = reach.process_text("SENP1 desumoylates HIF1A").statements
        print(statements)
        print(list(infer_species(statements)))
    except ImportError:
        print("indra not installed; skipping REACH text-processing demo")


if __name__ == "__main__":
    main()
