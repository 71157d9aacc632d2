#!/usr/bin/env python
"""Build the native ingest runtime: g++ -O2 -shared -fPIC."""
import os
import subprocess
import sys

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
src = os.path.join(root, "ground_fusion_tpu", "native", "src", "ingest.cpp")
out = os.path.join(root, "ground_fusion_tpu", "native", "libgfingest.so")
cmd = ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", "-o", out, src, "-pthread"]
print(" ".join(cmd))
sys.exit(subprocess.call(cmd))
