"""Regenerate docs/QUERIES.md — the user-facing catalog of every registered
query: name, oracle status, first docstring line.  Run after adding queries:

    python tools/gen_catalog.py > docs/QUERIES.md
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from encode_ingest_ray.pipelines import registry  # noqa: E402

registry.load_all()


def main() -> None:
    print("# Query catalog\n")
    print(
        f"{len(registry.QUERIES)} registered queries, "
        f"{len(registry.ORACLE)} with exact DuckDB oracles.  Every entry is\n"
        "callable as `queries()[name](sf_dir)` (driver contract) and verified\n"
        "by `python tools/check_oracles.py` at sf0.01 and sf0.1.\n"
    )
    print("| query | oracle | what it does |")
    print("|---|---|---|")
    for name, fn in registry.QUERIES.items():
        doc = (fn.__doc__ or "").strip().split("\n")[0].strip() or "—"
        kind = "exact" if name in registry.ORACLE else "rows-only"
        print(f"| `{name}` | {kind} | {doc} |")


if __name__ == "__main__":
    main()
