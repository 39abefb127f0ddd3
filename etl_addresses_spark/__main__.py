"""CLI: the engine's equivalent of `spacetime-etl addresses.<step>`.

    python -m etl_addresses_spark run --base <dir> --out <dir>
    python -m etl_addresses_spark infer --base <dir> --out <dir>
    python -m etl_addresses_spark transform --previous <dir> --out <dir>
    python -m etl_addresses_spark bench
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="etl_addresses_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="run all steps (infer -> transform)")
    run.add_argument("--base", required=True, help="dir with <dataset>/<step>/ NDJSON inputs")
    run.add_argument("--out", required=True, help="output dir (one subdir per step)")

    infer = sub.add_parser("infer", help="run only the infer step")
    infer.add_argument("--base", required=True)
    infer.add_argument("--out", required=True)

    tr = sub.add_parser("transform", help="run only the transform step")
    tr.add_argument("--previous", required=True, help="dir holding the inferred handoff")
    tr.add_argument("--out", required=True)

    sub.add_parser("bench", help="run the benchmark suite")

    args = p.parse_args(argv)
    if args.cmd == "bench":
        import bench

        bench.main()
        return 0

    from etl_addresses_spark import engine
    from etl_addresses_spark.session import get_spark

    spark = get_spark("etl_addresses_spark-cli")
    spark.sparkContext.setLogLevel("WARN")
    if args.cmd == "run":
        engine.run_pipeline(spark, args.base, args.out)
    elif args.cmd == "infer":
        os.makedirs(args.out, exist_ok=True)
        engine.infer(spark, {"base": args.base, "current": args.out, "previous": None})
    elif args.cmd == "transform":
        os.makedirs(args.out, exist_ok=True)
        engine.transform(
            spark, {"base": None, "current": args.out, "previous": args.previous}
        )
    return 0


if __name__ == "__main__":
    sys.exit(main())
