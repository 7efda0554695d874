#!/usr/bin/env python
"""Entry point — see diffse_tpu/cli/eval.py."""
from diffse_tpu.cli.eval import main

if __name__ == "__main__":
    main()
