#!/usr/bin/env python3
"""Repo-side leak scan with VERIFIABLE coverage.

The driver's per-round LEAKCHECK.json carries only hit lists, so a
reader cannot tell whether the scan actually ran over the round's new
code (ADVICE r7/r8, low). This script re-runs the same category scan
over every tracked text file and emits, alongside the hit lists:

  - files_scanned   : how many files the patterns ran over
  - bytes_scanned   : their total size
  - tree_hash       : sha256 over (path, content-sha256) of every
                      scanned file, sorted by path — proof of WHAT was
                      scanned; re-running on the same tree reproduces it

Usage:  python3 scripts/leakcheck.py [repo_root] [> LEAKCHECK_LOCAL.json]
Exit 1 when any category hits.
"""
import hashlib
import json
import os
import re
import subprocess
import sys

CATEGORIES = {
    # public-knowledge rule: nothing proprietary/internal may be cited.
    # Patterns mirror the driver's categories (LEAKCHECK.json keys).
    "internal-import": r"(?:import|from)\s+(?:anthropic|claude)[._]",
    "internal-url": r"https?://[a-z0-9.-]*(?:anthropic\.com|claude\.ai)[^\s\"']*",
    "internal-pkg2": r"\b(?:com|ai)\.anthropic\b",
    "internal-bucket": r"s3://[a-z0-9.-]*(?:anthropic|claude)[a-z0-9.-]*",
    "slack-link": r"\b[a-z0-9-]+\.slack\.com\b|#claude-code-",
    "api-key": r"\bsk-ant-[A-Za-z0-9_-]{8,}",
    "axon-env": r"\b(?:AXON|ANTHROPIC)_[A-Z0-9_]+\b",
}

SKIP_SUFFIXES = (".parquet", ".jar", ".png", ".jpg", ".class", ".duckdb")
# the scan script itself defines the patterns; scanning it would self-hit
SKIP_FILES = {"scripts/leakcheck.py"}


def tracked_files(root):
    out = subprocess.run(["git", "ls-files"], cwd=root, capture_output=True,
                         text=True, check=True).stdout
    return [f for f in out.splitlines()
            if f and not f.endswith(SKIP_SUFFIXES) and f not in SKIP_FILES]


def main():
    root = sys.argv[1] if len(sys.argv) > 1 else "."
    hits = {k: [] for k in CATEGORIES}
    compiled = {k: re.compile(v, re.IGNORECASE) for k, v in CATEGORIES.items()}
    tree = hashlib.sha256()
    files = tracked_files(root)
    nbytes = 0
    for path in sorted(files):
        full = os.path.join(root, path)
        try:
            with open(full, "rb") as fh:
                raw = fh.read()
        except OSError:
            continue
        nbytes += len(raw)
        tree.update(path.encode())
        tree.update(hashlib.sha256(raw).digest())
        try:
            text = raw.decode("utf-8")
        except UnicodeDecodeError:
            text = raw.decode("utf-8", errors="replace")
        for cat, rx in compiled.items():
            for m in rx.finditer(text):
                line = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{path}:{line}")
    n_hits = sum(len(v) for v in hits.values())
    print(json.dumps({
        "n_hits": n_hits,
        "files_scanned": len(files),
        "bytes_scanned": nbytes,
        "tree_hash": tree.hexdigest(),
        "hits": hits,
    }, indent=2))
    sys.exit(1 if n_hits else 0)


if __name__ == "__main__":
    main()
