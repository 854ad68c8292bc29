"""CLI entry point (reference etl_pipeline/cli.py:8-32).

Same argument surface plus Spark/sink knobs. Default sink is parquet
(``--output-dir``) so a run works with no database; ``--jdbc`` switches
to the Postgres path (DDL bootstrap + batched writes).

    python -m etl_pipeline_from_mongo_json_to_postgre_spark.cli \
        --input Data/input.json --mapping-config config/mapping.yaml \
        --output-dir out/
"""

from __future__ import annotations

import argparse
import sys

from .errors import ConfigError, InputError, LoadError


def parse_args(argv=None):
    parser = argparse.ArgumentParser(
        description="Configurable JSON to PostgreSQL ETL pipeline (PySpark engine)"
    )
    parser.add_argument("--input", required=True, help="Path to input JSON file.")
    parser.add_argument("--app-config", help="Path to application config file.")
    parser.add_argument("--mapping-config", required=True,
                        help="Path to mapping config file.")
    parser.add_argument("--output-dir", default="out",
                        help="Parquet output directory (default sink).")
    parser.add_argument("--jdbc", action="store_true",
                        help="Write to Postgres via JDBC instead of parquet.")
    parser.add_argument("--master", default="local[*]", help="Spark master.")
    parser.add_argument("--shuffle-partitions", type=int, default=32)
    return parser.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    try:
        from pyspark.sql import SparkSession

        from .config.loader import load_config, validate_app_config, validate_mapping_config
        from .pipeline import format_summary, run, write_run_jdbc, write_run_parquet

        spark = (
            SparkSession.builder.master(args.master)
            .appName("etl-pipeline-spark")
            .config("spark.sql.shuffle.partitions", str(args.shuffle_partitions))
            .config("spark.sql.adaptive.enabled", "true")
            .getOrCreate()
        )
        result = run(spark, args.input, args.mapping_config, args.app_config)
        if args.jdbc:
            app = validate_app_config(load_config(args.app_config) if args.app_config else {})
            mapping = validate_mapping_config(load_config(args.mapping_config))
            write_run_jdbc(spark, result, app, mapping)
        else:
            write_run_parquet(result, args.output_dir)
        print(format_summary(result.summary()))
        return 0
    except (ConfigError, InputError, LoadError) as exc:
        print(f"Pipeline error: {exc}", file=sys.stderr)
        return 1


if __name__ == "__main__":
    sys.exit(main())
