#!/usr/bin/env python
"""Entry point — see diffse_tpu/cli/eval_snr_est.py."""
from diffse_tpu.cli.eval_snr_est import main

if __name__ == "__main__":
    main()
