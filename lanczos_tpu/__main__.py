"""``python -m lanczos_tpu`` — command-line entry point (see cli.py)."""

from .cli import main

if __name__ == "__main__":
    main()
