"""Run ONE (or a few) named queries() entries through exactly the same
spark-vs-DuckDB comparison check_entry.py applies to the full registry
(shared :func:`check_entry.check_query`, dtype gate included) — the
fast inner loop while iterating on a single operator.

Usage: python tools/check_one.py NAME [NAME ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check_entry import check_query, get_session, make_duck  # noqa: E402


def main(names: list[str]) -> int:
    import __spark_entry__ as entrymod

    spark = get_session()
    con = make_duck()
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    rc = 0
    for name in names:
        if name not in qs:
            print(f"FAIL {name}: not registered")
            rc = 1
            continue
        reason, ok = check_query(spark, con, name, qs[name], oracles.get(name))
        if reason:
            print(f"FAIL {name}: {reason}")
            rc = 1
        else:
            print(f"  {name}: {ok}")
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
