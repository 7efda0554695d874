#!/usr/bin/env python
"""Entry point — see diffse_tpu/cli/serve.py."""
from diffse_tpu.cli.serve import main

if __name__ == "__main__":
    main()
