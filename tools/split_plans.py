#!/usr/bin/env python3
"""Split `graft.Plans` stdout into per-query plan files.

Usage: split_plans.py <plans_stdout.txt> <outdir> <suffix>
Writes <outdir>/<query>_<suffix>.txt for every "===== <query> =====" block,
stripping sbt's [info]/[error] prefixes.
"""
import re
import sys
import pathlib

src, outdir, suffix = sys.argv[1], pathlib.Path(sys.argv[2]), sys.argv[3]
outdir.mkdir(parents=True, exist_ok=True)
name, buf = None, []


def flush():
    if name and buf:
        (outdir / f"{name}_{suffix}.txt").write_text("\n".join(buf).strip() + "\n")


for raw in open(src, errors="replace"):
    line = re.sub(r"^\[(info|error)\]\s?", "", raw.rstrip("\n"))
    m = re.match(r"^=+\s*(\S+)\s*=+$", line)
    if m:
        flush()
        name, buf = m.group(1), []
    elif name is not None:
        buf.append(line)
flush()
print(f"wrote plans to {outdir}")
