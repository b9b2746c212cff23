"""CLI — the engine's analog of ``python -m fastjsonschema`` (reference
``__main__.py:7-15``) plus a batch runner for spark-submit:

  # show the compiled plan for a schema (like compile_to_code)
  python -m spark_schema_guard plan --schema schema.json [--table t.parquet]

  # validate a parquet table, write verdicts/violations, resumable audit
  spark-submit --py-files engine.zip -m spark_schema_guard validate \\
      --schema schema.json --table in.parquet --out out_dir \\
      [--audit audit_dir] [--cores N]

  # mine a schema FROM a table (typed columns, or a JSON string column
  # with --json-col), then validate future batches with it
  python -m spark_schema_guard suggest --table t.parquet --out schema.json
"""

from __future__ import annotations

import argparse
import json
import sys


def _load_schema(path: str) -> dict:
    if path == "-":
        return json.load(sys.stdin)
    with open(path) as fh:
        return json.load(fh)


def cmd_plan(args) -> int:
    import spark_schema_guard as ssg
    from spark_schema_guard.session import build_session

    schema = _load_schema(args.schema)
    if args.table:
        spark = build_session(cores=args.cores)
        df_schema = _read_table(spark, args.table, "parquet").schema
    else:
        # no table: row-validator compile only (definition check + keyword list)
        ssg.compile(schema)
        print("schema compiles; row validator ready (no table given, "
              "columnar plan needs --table)")
        return 0
    plan = ssg.compile_plan(schema, df_schema)
    print(plan.explain())
    if args.save:
        plan.save(args.save)
        print(f"plan spec saved to {args.save}")
    return 0


def _read_table(spark, path: str, fmt: str):
    # path OR catalog identifier (e.g. iceberg.prod.web_pages) — io.py
    # routes catalog refs through spark.read.table.
    from spark_schema_guard.io import read_table

    return read_table(spark, path, fmt)


def cmd_validate(args) -> int:
    import spark_schema_guard as ssg
    from pyspark.sql import functions as F
    from spark_schema_guard.session import build_session

    if not args.schema and not args.plan_spec:
        print("validate needs --schema or --plan-spec", file=sys.stderr)
        return 2
    spark = build_session(cores=args.cores)
    df = _read_table(spark, args.table, args.format)
    if args.plan_spec:
        plan = ssg.load_plan(args.plan_spec, df.schema)
    else:
        schema = _load_schema(args.schema)
        plan = ssg.compile_plan(schema, df.schema, regex_engine=args.regex_engine)

    if args.audit:
        from spark_schema_guard.audit import AuditedRun

        run = AuditedRun(spark, plan, args.table, args.audit)
        summary = run.run(violations_path=f"{args.out}/violations"
                          if args.out else None)
        print(json.dumps(summary))
        return 0

    applied = plan.apply(df)
    if args.out:
        applied.write.mode("overwrite").parquet(f"{args.out}/validated")
    counts = applied.groupBy("verdict").count().collect()
    print(json.dumps({str(r["verdict"]): r["count"] for r in counts}))
    return 0


def cmd_suggest(args) -> int:
    """Mine a schema FROM a table (the inverse of validate): typed
    columns via suggest_constraints/suggested_schema, or a dynamic JSON
    string column via --json-col (suggest_json_constraints /
    suggested_json_schema).  The emitted JSON feeds straight back into
    ``plan --schema`` / ``validate --schema`` — mine on a trusted
    snapshot, then gate every future batch with the mined contract."""
    from spark_schema_guard.session import build_session

    if args.json_col and args.columns:
        print("suggest: --json-col and --columns are mutually exclusive "
              "(--columns selects typed columns; --json-col mines a "
              "dynamic JSON column instead)", file=sys.stderr)
        return 2
    spark = build_session(cores=args.cores)
    df = _read_table(spark, args.table, args.format)
    if args.json_col:
        from spark_schema_guard.operators.suggest import suggested_json_schema

        mined = suggested_json_schema(df, args.json_col,
                                      enum_max=args.enum_max,
                                      distinct=args.distinct)
    else:
        from spark_schema_guard.operators.suggest import suggested_schema

        cols = args.columns.split(",") if args.columns else None
        mined = suggested_schema(df, cols, enum_max=args.enum_max,
                                 distinct=args.distinct)
    text = json.dumps(mined, indent=1, sort_keys=True)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(text + "\n")
        print(json.dumps({"schema": args.out,
                          "properties": len(mined.get("properties", {}))}))
    else:
        print(text)
    return 0


def cmd_package(args) -> int:
    """Build the ``--py-files`` zip for cluster submission: the whole
    ``spark_schema_guard`` package, importable from the zip root, so

        spark-submit --py-files engine.zip job.py

    (or ``... -m spark_schema_guard validate ...``) works on executors
    with no install step."""
    import os
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    root = os.path.dirname(pkg_dir)
    count = 0
    with zipfile.ZipFile(args.out, "w", zipfile.ZIP_DEFLATED) as zf:
        for dirpath, dirnames, filenames in os.walk(pkg_dir):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for name in sorted(filenames):
                if not name.endswith(".py"):
                    continue
                full = os.path.join(dirpath, name)
                zf.write(full, os.path.relpath(full, root))
                count += 1
    print(json.dumps({"zip": args.out, "files": count}))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="spark_schema_guard")
    sub = parser.add_subparsers(dest="cmd", required=True)

    p_plan = sub.add_parser("plan", help="compile and display a plan")
    p_plan.add_argument("--schema", required=True)
    p_plan.add_argument("--table")
    p_plan.add_argument("--save", help="write the plan spec JSON here "
                        "(reload with validate --plan-spec)")
    p_plan.add_argument("--cores", type=int, default=4)
    p_plan.set_defaults(fn=cmd_plan)

    p_val = sub.add_parser("validate", help="validate a parquet table")
    p_val.add_argument("--schema")
    p_val.add_argument("--plan-spec", help="saved plan spec JSON "
                       "(alternative to --schema)")
    p_val.add_argument("--table", required=True)
    p_val.add_argument("--out")
    p_val.add_argument("--audit")
    p_val.add_argument("--cores", type=int, default=4)
    p_val.add_argument("--regex-engine", default="jvm",
                       choices=["jvm", "python"])
    p_val.add_argument("--format", default="parquet",
                       choices=["parquet", "csv", "json"])
    p_val.set_defaults(fn=cmd_validate)

    p_sug = sub.add_parser(
        "suggest", help="mine a JSON schema from a table (or from a "
        "JSON string column with --json-col)")
    p_sug.add_argument("--table", required=True)
    p_sug.add_argument("--out", help="write the mined schema JSON here "
                       "(stdout otherwise)")
    p_sug.add_argument("--json-col", help="mine per-key constraints from "
                       "this dynamic JSON string column instead of the "
                       "table's typed columns")
    p_sug.add_argument("--columns", help="comma-separated typed columns "
                       "to profile (default: all)")
    p_sug.add_argument("--enum-max", type=int, default=16)
    p_sug.add_argument("--distinct", default="approx",
                       choices=["approx", "exact"])
    p_sug.add_argument("--cores", type=int, default=4)
    p_sug.add_argument("--format", default="parquet",
                       choices=["parquet", "csv", "json"])
    p_sug.set_defaults(fn=cmd_suggest)

    p_pkg = sub.add_parser(
        "package", help="build the spark-submit --py-files zip")
    p_pkg.add_argument("--out", default="engine.zip")
    p_pkg.set_defaults(fn=cmd_package)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
