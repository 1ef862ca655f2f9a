#!/usr/bin/env python3
"""Differential-fuzz driver (DuckDB half): after
`sbt "runMain graft.tools.Fuzz <base> <seed>..."` has generated the
seed corpora and Verify dumps, run the gate compare (tools/check.py)
against EACH seed and summarize.

Usage: python3 tools/fuzz.py <base> <seed>...
Exit 0 only if every seed's board is fully green.
"""
import subprocess, sys, os

base, seeds = sys.argv[1], sys.argv[2:]
here = os.path.dirname(os.path.abspath(__file__))
red = []
for s in seeds:
    data, out = f"{base}/seed{s}/data", f"{base}/seed{s}/out"
    r = subprocess.run([sys.executable, f"{here}/check.py", data, out],
                       capture_output=True, text=True)
    lines = r.stdout.strip().splitlines()
    last = lines[-1] if lines else "(no check output)"
    print(f"seed {s}: {last}")
    if r.returncode != 0:
        red.append(s)
        for line in lines:
            if not line.startswith("OK") and line.strip():
                print(f"    {line}")

print(f"\nfuzz summary: {len(seeds) - len(red)}/{len(seeds)} seeds green"
      + (f"; red seeds: {red}" if red else ""))
sys.exit(1 if red else 0)
