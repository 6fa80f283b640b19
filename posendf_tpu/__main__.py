"""``python -m posendf_tpu`` — alias for the CLI (see cli.py)."""

from posendf_tpu.cli import main

if __name__ == "__main__":
    main()
