"""CLI: run a registered pipeline or the bench-style query list.

    python -m hg_data_pipelines_spark run <pipeline> --warehouse DIR \
        [--config k=v ...]
    python -m hg_data_pipelines_spark list
    python -m hg_data_pipelines_spark query <name> --sf-dir DIR [--limit N]
    python -m hg_data_pipelines_spark explain <name> [--mode formatted]
    python -m hg_data_pipelines_spark compact <table_dir> [--target-mb N]
    python -m hg_data_pipelines_spark snapshots list|show|expire \
        --warehouse DIR --table T [--version N] [--keep K]

The scheduler (cron/airflow) calls ``run``; ``query`` executes one declared
query and prints rows — the operational front door to the engine.
"""

from __future__ import annotations

import argparse
import sys


def _coerce(v: str):
    """--config values arrive as strings; pipelines expect typed values
    (pano_width is an int, with_uuid a bool). int → float → bool → str."""
    for cast in (int, float):
        try:
            return cast(v)
        except ValueError:
            pass
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    return v


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="hg_data_pipelines_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run_p = sub.add_parser("run", help="run a registered pipeline")
    run_p.add_argument("pipeline")
    run_p.add_argument("--warehouse", required=True)
    run_p.add_argument("--config", nargs="*", default=[], metavar="K=V")
    run_p.add_argument(
        "--mesh-obj",
        help="OBJ or STL mesh file for the mesh-intersection stage "
        "(becomes config['mesh_triangles']; format by extension)",
    )

    sub.add_parser("list", help="list pipelines and declared queries")

    q_p = sub.add_parser("query", help="run one declared query")
    q_p.add_argument("name")
    q_p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q_p.add_argument("--limit", type=int, default=20)

    e_p = sub.add_parser(
        "explain", help="print a declared query's physical plan"
    )
    e_p.add_argument("name")
    e_p.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    e_p.add_argument(
        "--mode",
        default="formatted",
        choices=["simple", "extended", "formatted", "cost", "codegen"],
    )

    c_p = sub.add_parser(
        "compact", help="compact a Parquet table's small files"
    )
    c_p.add_argument("path")
    c_p.add_argument("--target-mb", type=int, default=128)

    s_p = sub.add_parser(
        "snapshots", help="list/read/expire table snapshot versions"
    )
    s_p.add_argument("action", choices=["list", "show", "expire"])
    s_p.add_argument("--warehouse", required=True)
    s_p.add_argument("--table", required=True)
    s_p.add_argument("--version", type=int, help="pin a version for show")
    s_p.add_argument("--keep", type=int, default=2, help="versions kept on expire")
    s_p.add_argument("--limit", type=int, default=20)

    args = ap.parse_args(argv)

    if args.cmd == "list":
        from .jobs import _PIPELINES
        from .queries import ORACLES, QUERIES

        print("pipelines:")
        for name, p in _PIPELINES.items():
            print(f"  {name}: " + " -> ".join(s.name for s in p.stages))
        print(f"queries ({len(QUERIES)}; * = DuckDB-oracle-checked):")
        for name in QUERIES:
            mark = "*" if name in ORACLES else " "
            print(f"  {mark} {name}")
        return 0

    from .session import get_spark

    spark = get_spark("hg-cli")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        if args.cmd == "run":
            from .jobs import run_pipeline

            config = {
                k: _coerce(v)
                for k, v in (kv.split("=", 1) for kv in args.config)
            }
            if args.mesh_obj:
                from .pipelines.wall_extraction import (
                    parse_obj_triangles,
                    parse_stl_triangles,
                )

                if args.mesh_obj.lower().endswith(".stl"):
                    with open(args.mesh_obj, "rb") as fb:
                        config["mesh_triangles"] = parse_stl_triangles(fb.read())
                else:
                    with open(args.mesh_obj) as fh:
                        config["mesh_triangles"] = parse_obj_triangles(fh.read())
            ctx = run_pipeline(spark, args.pipeline, args.warehouse, config)
            for stage, rep in ctx.reports.items():
                print(f"{stage}: {rep['rows']} rows -> {rep['path']}")
            return 0

        if args.cmd == "query":
            from .queries import QUERIES

            if args.name not in QUERIES:
                print(f"unknown query: {args.name}", file=sys.stderr)
                return 2
            df = QUERIES[args.name](spark, args.sf_dir)
            df.show(args.limit, truncate=False)
            return 0

        if args.cmd == "explain":
            from .queries import QUERIES

            if args.name not in QUERIES:
                print(f"unknown query: {args.name}", file=sys.stderr)
                return 2
            QUERIES[args.name](spark, args.sf_dir).explain(args.mode)
            return 0

        if args.cmd == "compact":
            from .io import compact_table

            n = compact_table(
                spark, args.path, target_file_bytes=args.target_mb * 1024 * 1024
            )
            print(f"compacted -> {n} file(s)")
            return 0

        if args.cmd == "snapshots":
            from .snapshots import (
                expire_snapshots,
                read_table_snapshot,
                snapshot_versions,
            )

            if args.action == "list":
                for v in snapshot_versions(args.warehouse, args.table):
                    print(f"v{v}")
            elif args.action == "show":
                read_table_snapshot(
                    spark, args.warehouse, args.table, args.version
                ).show(args.limit, truncate=False)
            else:
                expired = expire_snapshots(
                    args.warehouse, args.table, keep_latest=args.keep
                )
                print(f"expired: {[f'v{v}' for v in expired]}")
            return 0
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
