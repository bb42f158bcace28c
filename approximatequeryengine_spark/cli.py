"""CLI mirroring the reference's query surfaces (``enhanced_aqe_cli.py``
and ``aqe_frontend/cli.py``) with the *documented* flag routing
(README.md:209-218; fixes reference quirk Q1 where ``--sample``/
``--error`` could never reach their handlers — SURVEY.md §4.4).

Usage examples (reference parity):

    python -m approximatequeryengine_spark.cli \
        "SELECT APPROX(SUM(l_extendedprice)) FROM lineitem" --data /root/testdata/sf0.01
    ... "SELECT SUM(l_extendedprice) FROM lineitem" -s 10 --ci --compare
    ... "SELECT AVG(value) FROM events" -e 2 --method clt
    ... --explain
"""

from __future__ import annotations

import argparse
import sys

from approximatequeryengine_spark.engine import AQEngine
from approximatequeryengine_spark.frontend.dialect import METHODS
from approximatequeryengine_spark.result import ApproximationStatus
from approximatequeryengine_spark.session import get_spark


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="aqe-spark",
        description="PySpark-native approximate query engine",
    )
    p.add_argument("query", nargs="?", help="SQL (APPROX dialect or full Spark SQL)")
    p.add_argument("--data", default="/root/testdata/sf0.01", help="directory of parquet tables")
    p.add_argument("-s", "--sample", type=float, default=None, metavar="PCT",
                   help="sampling percentage (1-100) → fixed-fraction sampling")
    p.add_argument("-e", "--error", type=float, default=None, metavar="PCT",
                   help="max relative error %% → adaptive CLT sampling")
    p.add_argument("--method", choices=[*sorted(METHODS), "auto"], default=None,
                   help="force a sampling method, or 'auto' for the "
                   "data-driven advisor (measured cv2/top-share moments "
                   "pick outlier/pps/revolutionary/clt for global SUM; "
                   "the bakeoff-calibrated exact/sampled/ddsketch rule "
                   "for global MEDIAN/PERCENTILE; static ladder "
                   "elsewhere)")
    p.add_argument("--stratum-col", default=None, metavar="COL",
                   help="stratum column for method=poststrat")
    p.add_argument("--aux-column", default=None, metavar="COL",
                   help="auxiliary column/expression for method=regaux")
    p.add_argument("--ci", action="store_true", help="show confidence intervals")
    p.add_argument("--confidence", type=float, default=0.95,
                   help="confidence level for CIs (default 0.95)")
    p.add_argument("--threads", type=int, default=None,
                   help="reference-compat flag; parallelism is the Spark "
                   "master's core count here (local[N])")
    p.add_argument("--compare", action="store_true",
                   help="also run exact and report actual error + speedup")
    p.add_argument("--explain", action="store_true",
                   help="describe available methods and exit; with a "
                   "query, also show what --method auto would pick for "
                   "it and the moment evidence, without running it")
    p.add_argument("--plan", action="store_true",
                   help="print the Spark physical plan of the result")
    p.add_argument("--validate", action="store_true",
                   help="run the data-quality constraint suite against "
                   "--data and exit non-zero if any check fails (the "
                   "pre-training CI gate; no query needed)")
    return p


def print_methods() -> None:
    print("Available methods:")
    for name, info in METHODS.items():
        print(f"  {name:14s} {info['description']}")


def format_result(res, args) -> str:
    lines = []
    if res.value is not None:
        lines.append(f"Result: {res.value:,.4f}")
        if args.ci and res.ci_lower is not None:
            lines.append(
                f"{res.confidence_level:.0%} CI: [{res.ci_lower:,.4f}, {res.ci_upper:,.4f}] "
                f"(±{res.error_margin:,.4f})"
            )
    lines.append(
        f"Status: {res.status.value} | method: {res.method} | "
        f"confidence: {res.confidence_level:.2f} | samples: {res.samples_used:,} | "
        f"fraction: {res.fraction:.4g} | time: {res.computation_time:.3f}s"
    )
    if "__advisor__" in res.groups:
        a = res.groups["__advisor__"]
        if "cv2" in a:  # SUM-family moment evidence
            lines.append(
                f"Auto-selected '{a['recommended_method']}' from measured moments: "
                f"n={a['n']:,} cv2={a['cv2']} top_share={a['top_share']} "
                f"pred_rel_ci@10%={a['pred_rel_ci_uniform10']}"
            )
        else:  # quantile-family bakeoff evidence
            lines.append(
                f"Auto-selected '{a['recommended_method']}' from quantile "
                f"evidence: n={a['n']:,} q={a['q']} "
                f"sample_rel_ci={a['sample_rel_ci']} "
                f"positive_only={a['positive_only']} "
                f"tolerance={a['tolerance']}"
            )
    if "__actual_error_pct__" in res.groups:
        lines.append(
            f"Exact: {res.groups['__exact__']:,.4f} | actual error: "
            f"{res.groups['__actual_error_pct__']:.3f}% | speedup: "
            f"{res.groups['__speedup__']:.2f}x"
        )
    return "\n".join(lines)


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    if args.explain:
        print_methods()
        if args.query:
            spark = get_spark(app_name="aqe-cli")
            spark.sparkContext.setLogLevel("ERROR")
            try:
                info = AQEngine(spark, args.data).explain_auto(args.query)
                line = (
                    f"--method auto would pick '{info['method']}' "
                    f"({info['source']})"
                )
                if info["evidence"]:
                    a = info["evidence"]
                    if "cv2" in a:  # SUM-family moment evidence
                        line += (
                            f": n={a['n']:,} cv2={a['cv2']} "
                            f"top_share={a['top_share']} "
                            f"pred_rel_ci@10%={a['pred_rel_ci_uniform10']}"
                        )
                    else:  # quantile-family bakeoff evidence
                        line += (
                            f": n={a['n']:,} q={a['q']} "
                            f"sample_rel_ci@{a['fraction']:.0%}="
                            f"{a['sample_rel_ci']} "
                            f"dd_alpha={a['dd_alpha']} "
                            f"tolerance={a['tolerance']}"
                        )
                print(line)
            finally:
                spark.stop()
        return 0
    if args.validate:
        from approximatequeryengine_spark.catalog import Catalog
        from approximatequeryengine_spark.operators.profiling import (
            constraint_checks_orders,
        )

        spark = get_spark(app_name="aqe-cli")
        spark.sparkContext.setLogLevel("ERROR")
        try:
            cat = Catalog(spark, args.data)
            rows = constraint_checks_orders(
                spark, cat.table("orders"), cat.table("customer")
            ).collect()
            failed = [r for r in rows if not r["passed"]]
            for r in rows:
                mark = "PASS" if r["passed"] else "FAIL"
                print(f"  {mark}  {r['check_name']:32s} metric={r['metric']}")
            print(f"{len(rows) - len(failed)}/{len(rows)} checks passed")
            return 1 if failed else 0
        finally:
            spark.stop()
    if not args.query:
        print("error: a query is required (or --explain)", file=sys.stderr)
        return 2

    spark = get_spark(app_name="aqe-cli")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        eng = AQEngine(spark, args.data)
        res = eng.run(
            args.query,
            sample_pct=args.sample,
            error_pct=args.error,
            method=args.method,
            compare=args.compare,
            confidence=args.confidence,
            stratum_col=args.stratum_col,
            aux_column=args.aux_column,
        )
        if res.value is None and res.df is not None:
            # grouped / passthrough results: print the table itself
            res.df.show(50, truncate=False)
        print(format_result(res, args))
        if args.plan:
            print(res.df._jdf.queryExecution().explainString("formatted"))
        return 0 if res.status != ApproximationStatus.ERROR else 1
    finally:
        spark.stop()


if __name__ == "__main__":
    raise SystemExit(main())
