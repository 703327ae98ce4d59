"""CLI entry point (mirrors reference tools/run.py:1-9):
python tools/run.py {fit,validate,test,predict} --config <yaml> [...]
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from refign_tpu.cli import main

if __name__ == "__main__":
    raise SystemExit(main())
