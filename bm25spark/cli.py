"""spark-submit entry point.

Usage (ship the package with --py-files):

    zip -r bm25spark.zip bm25spark
    spark-submit --py-files bm25spark.zip -m bm25spark.cli build \
        --input s3://bucket/corpus --format iceberg \
        --text-col content --order-cols repo,path,commit \
        --index-dir s3://bucket/indexes/corpus_bm25

Subcommands: build | search | search-dist | search-batch |
search-delta | search-delta-batch | insert | delete | vacuum | gc |
lineage.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import DataFrame, SparkSession


def load_table(spark: SparkSession, source: str, fmt: str = "auto") -> DataFrame:
    """Read an input table: an Iceberg/catalog table name or a
    parquet path. ``auto`` tries the catalog first, then parquet."""
    if fmt == "iceberg" or (fmt == "auto" and "/" not in source):
        try:
            return spark.read.table(source)
        except Exception:
            if fmt == "iceberg":
                raise
    if fmt in ("auto", "parquet"):
        return spark.read.parquet(source)
    return spark.read.format(fmt).load(source)


def main(argv: list[str] | None = None) -> None:
    from .build import build_index
    from .config import Bm25Config, derive_seed
    from .distributed import search_distributed
    from .index import Bm25Index
    from .maintain import vacuum

    ap = argparse.ArgumentParser(prog="bm25spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--format", default="auto")
    b.add_argument("--text-col", required=True)
    b.add_argument("--order-cols", required=True, help="comma-separated unique key")
    b.add_argument("--index-dir", required=True)
    b.add_argument("--analyzer", default="code")
    b.add_argument("--k1", type=float, default=1.2)
    b.add_argument("--b", type=float, default=0.75)
    b.add_argument("--shard-size", type=int, default=1 << 20)
    b.add_argument("--seed-name", default="bm25spark")
    b.add_argument("--resume", action="store_true")

    for name in ("search", "search-dist"):
        s = sub.add_parser(name)
        s.add_argument("--index-dir", required=True)
        s.add_argument("--query", required=True)
        s.add_argument("-k", type=int, default=100)
        if name == "search-dist":
            s.add_argument(
                "--deleted-aware", action="store_true",
                help="exclude tombstoned docs (P4 mask; see 'delete')",
            )

    sb = sub.add_parser(
        "search-batch", help="M queries in one Spark job (one per line)"
    )
    sb.add_argument("--index-dir", required=True)
    sb.add_argument(
        "--queries-file", required=True,
        help="text file, one query per line; line number = query_id",
    )
    sb.add_argument("-k", type=int, default=100)
    sb.add_argument(
        "--deleted-aware", action="store_true",
        help="exclude tombstoned docs (P4 mask; see 'delete')",
    )

    v = sub.add_parser("vacuum")
    v.add_argument("--index-dir", required=True)
    v.add_argument("--text-col", required=True)

    g = sub.add_parser("gc", help="reclaim the retired index generation")
    g.add_argument("--index-dir", required=True)
    g.add_argument("--grace-sec", type=float, default=None)

    ins = sub.add_parser("insert")
    ins.add_argument("--index-dir", required=True)
    ins.add_argument("--input", required=True)
    ins.add_argument("--format", default="auto")
    ins.add_argument("--text-col", required=True)

    de = sub.add_parser("delete")
    de.add_argument("--index-dir", required=True)
    de.add_argument("--input", required=True, help="table of payload keys")
    de.add_argument("--format", default="auto")

    sd = sub.add_parser("search-delta")
    sd.add_argument("--index-dir", required=True)
    sd.add_argument("--query", required=True)
    sd.add_argument("--text-col", required=True)
    sd.add_argument("-k", type=int, default=100)

    sdb = sub.add_parser(
        "search-delta-batch",
        help="M queries against the mutated (growing∪sealed) index in "
        "two Spark jobs total",
    )
    sdb.add_argument("--index-dir", required=True)
    sdb.add_argument(
        "--queries-file", required=True,
        help="text file, one query per line; line number = query_id",
    )
    sdb.add_argument("--text-col", required=True)
    sdb.add_argument("-k", type=int, default=100)

    ln = sub.add_parser("lineage")
    ln.add_argument("--index-dir", required=True)

    args = ap.parse_args(argv)
    spark = SparkSession.builder.appName(f"bm25spark-{args.cmd}").getOrCreate()

    if args.cmd == "build":
        cfg = Bm25Config(
            k1=args.k1,
            b=args.b,
            seed=derive_seed(args.seed_name),
            analyzer=args.analyzer,
            shard_size=args.shard_size,
        )
        df = load_table(spark, args.input, args.format)
        build_index(
            spark,
            df,
            args.index_dir,
            args.text_col,
            args.order_cols.split(","),
            cfg=cfg,
            resume=args.resume,
        )
        idx = Bm25Index(spark, args.index_dir)
        print(json.dumps({"built": args.index_dir, "n_docs": idx.n_docs}))
    elif args.cmd == "search":
        idx = Bm25Index(spark, args.index_dir)
        for row in idx.search_df(args.query, args.k).collect():
            print(json.dumps(row.asDict(), default=str))
    elif args.cmd == "search-dist":
        blocked = None
        if args.deleted_aware:
            from .maintain import _tombstones_df

            blocked = _tombstones_df(spark, args.index_dir)
        for row in search_distributed(
            spark, args.index_dir, args.query, args.k, blocked=blocked
        ).collect():
            print(json.dumps(row.asDict(), default=str))
    elif args.cmd == "search-batch":
        from .distributed import search_distributed_batch

        blocked = None
        if args.deleted_aware:
            from .maintain import _tombstones_df

            blocked = _tombstones_df(spark, args.index_dir)
        with open(args.queries_file) as f:
            qs = {
                str(i): line.strip()
                for i, line in enumerate(f)
                if line.strip()
            }
        for row in search_distributed_batch(
            spark, args.index_dir, qs, args.k, blocked=blocked
        ).collect():
            print(json.dumps(row.asDict(), default=str))
    elif args.cmd == "vacuum":
        vacuum(spark, args.index_dir, args.text_col)
        print(json.dumps({"vacuumed": args.index_dir}))
    elif args.cmd == "gc":
        from .maintain import gc_index

        reclaimed = gc_index(args.index_dir, grace_sec=args.grace_sec)
        print(json.dumps({"reclaimed": bool(reclaimed)}))
    elif args.cmd == "insert":
        from .maintain import delta_size, insert

        insert(
            spark,
            args.index_dir,
            load_table(spark, args.input, args.format),
            args.text_col,
        )
        print(json.dumps({"delta_rows": delta_size(spark, args.index_dir)}))
    elif args.cmd == "delete":
        from .maintain import delete

        delete(spark, args.index_dir, load_table(spark, args.input, args.format))
        print(json.dumps({"deleted_from": args.index_dir}))
    elif args.cmd == "search-delta":
        from .maintain import search_with_delta_df

        for row in search_with_delta_df(
            spark, args.index_dir, args.query, args.k, args.text_col
        ).collect():
            print(json.dumps(row.asDict(), default=str))
    elif args.cmd == "search-delta-batch":
        from .maintain import search_with_delta_batch_df

        with open(args.queries_file) as f:
            qs = {
                str(i): line.strip()
                for i, line in enumerate(f)
                if line.strip()
            }
        for row in search_with_delta_batch_df(
            spark, args.index_dir, qs, args.k, args.text_col
        ).collect():
            print(json.dumps(row.asDict(), default=str))
    elif args.cmd == "lineage":
        idx = Bm25Index(spark, args.index_dir)
        for row in idx.lineage_df().collect():
            print(json.dumps(row.asDict(), default=str))


if __name__ == "__main__":
    main()
