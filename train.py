#!/usr/bin/env python
"""Entry point — see diffse_tpu/cli/train.py."""
from diffse_tpu.cli.train import main

if __name__ == "__main__":
    main()
