#!/usr/bin/env python3
"""check_parity restricted to query-name prefixes (local iteration).

Usage: python3 tools/check_parity_only.py <sfDir> <verifyOutDir> <prefixes>

Builds a throwaway view of the verify dir (filtered oracle_sql.json +
symlinks to the selected query outputs) instead of mutating the shared
oracle_sql.json in place — a hard kill mid-run must never leave the real
artifact truncated to the subset.
"""
import sys, os, json, tempfile
import check_parity as cp


def main(sf_dir, out_dir, prefixes):
    ps = prefixes.split(",")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    kept = {k: v for k, v in oracles.items()
            if any(k.startswith(p) for p in ps)}
    with tempfile.TemporaryDirectory(prefix="parity_only_") as tmp:
        with open(f"{tmp}/oracle_sql.json", "w") as f:
            json.dump(kept, f)
        for name in kept:
            src = f"{out_dir}/{name}"
            if os.path.exists(src):
                os.symlink(os.path.abspath(src), f"{tmp}/{name}")
            else:
                print(f"WARN: no verify output for {name} at {src}",
                      file=sys.stderr)
        return cp.main(sf_dir, tmp)


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
