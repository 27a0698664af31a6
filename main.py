#!/usr/bin/env python3
"""Flag-compatible CLI entry point (see directdemod_tpu/cli.py; reference
surface at /root/reference/main.py:18-56)."""
import sys

from directdemod_tpu.cli import main

if __name__ == "__main__":
    sys.exit(main())
