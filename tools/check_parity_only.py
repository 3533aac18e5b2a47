#!/usr/bin/env python3
"""check_parity restricted to query-name prefixes (local iteration).

Usage: python3 tools/check_parity_only.py <sfDir> <verifyOutDir> <prefixes>
"""
import sys, json
import check_parity as cp


def main(sf_dir, out_dir, prefixes):
    ps = prefixes.split(",")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    kept = {k: v for k, v in oracles.items()
            if any(k.startswith(p) for p in ps)}
    json.dump(kept, open(f"{out_dir}/oracle_sql.json", "w"))
    try:
        return cp.main(sf_dir, out_dir)
    finally:
        json.dump(oracles, open(f"{out_dir}/oracle_sql.json", "w"))


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3]))
