#!/usr/bin/env python
"""Drop-in entry point: decompose an image with the trained reflectance CNN.

Same flags and outputs as the reference script of the same name; the compute
runs as a single XLA program on TPU.  See
reflectance_filtering_tpu/cli/decompose.py.
"""
from reflectance_filtering_tpu.cli.decompose import main

if __name__ == "__main__":
    main()
