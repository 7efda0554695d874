#!/usr/bin/env python
"""Entry point — see diffse_tpu/cli/deep_eval.py."""
from diffse_tpu.cli.deep_eval import main

if __name__ == "__main__":
    main()
