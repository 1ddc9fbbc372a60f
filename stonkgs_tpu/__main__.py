"""Entrypoint module for ``python -m stonkgs_tpu``."""

from stonkgs_tpu.cli import main

if __name__ == "__main__":
    main()
