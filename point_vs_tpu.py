#!/usr/bin/env python3
"""CLI entry point — see pointvs_tpu/main.py (ref: point_vs.py)."""
from pointvs_tpu.main import main

if __name__ == '__main__':
    main()
