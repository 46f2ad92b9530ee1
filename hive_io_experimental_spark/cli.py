"""hivetail-style CLI: scan / limit / print / stats, plus a write command.

Parity with the reference's cmdline module (`Main.main` dispatches
{help, tail, benchmark, conf-options, output} —
hive-io-exp-cmdline/.../cmdline/Main.java:39-49). Here:

  tail       scan table -> limit -> separator-joined rows on stdout, with a
             rows/s + MB/s stats line (TailerCmd.java:100-268,
             RecordPrinter.java:40-80, Stats.java:92-162). `--append-stats-to`
             appends the reference's CSV columns
             rows,threads,MB,seconds,rows/s,MB/s (Stats.java:133-151).
  benchmark  tail without printing (parse-only scan throughput, the
             InputBenchmark.java:115-136 shape).
  write      generate-or-read rows and write into a catalog table partition
             (OutputCmd shape, cmdline/.../output/OutputCmd.java).

The reference hand-threads a split queue (--threads); Spark tasks already
parallelize the scan, so --threads only sizes the session's local[] master.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

from hive_io_experimental_spark.input import HiveInput, ScanSpec


def _table_bytes(path: str) -> int:
    if os.path.isfile(path):
        return os.path.getsize(path)
    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                total += os.path.getsize(os.path.join(root, f))
    return total


def _build_spark(threads: int | None):
    from hive_io_experimental_spark.session import get_spark

    master = f"local[{threads}]" if threads else None
    return get_spark("hivetail", master=master)


def resolve_namespace(path: str, name: str) -> str:
    """Resolve a warehouse location from a namespaces file.

    Reference parity: TailerCmd resolves the metastore host/port from a
    namespaces file when one is given (tailer/TailerCmd.java:276-284), a
    JSON document mapping cluster name -> endpoints
    (options/NamespaceOptions.java:68-84, ``{"data": {name: [...]}}``).
    This engine's catalog endpoint is a warehouse directory, so entries are
    warehouse paths. Divergence: the reference shuffles and picks a random
    endpoint (thrift load balancing); warehouse paths are replicas of one
    catalog, so the FIRST entry is used deterministically.
    """
    import json

    with open(path) as f:
        doc = json.load(f)
    data = doc.get("data", {})
    entries = data.get(name)
    if not entries:
        raise SystemExit(
            f"namespace {name!r} not found in {path} "
            f"(available: {sorted(data)})"
        )
    first = entries[0]
    # tolerate the reference's host/port object shape for file-path entries
    if isinstance(first, dict):
        first = first.get("warehouse") or first.get("host")
    if not isinstance(first, str):
        raise SystemExit(f"namespace {name!r} entry is not a path: {first!r}")
    return first


def _resolve_warehouse(args: argparse.Namespace) -> str | None:
    """--namespaces-file + --namespace beat --warehouse when both given."""
    if getattr(args, "namespaces_file", None):
        return resolve_namespace(args.namespaces_file, args.namespace)
    return args.warehouse


def cmd_tail(args: argparse.Namespace, print_rows: bool = True,
             stop_session: bool = True) -> int:
    spark = _build_spark(args.threads)
    catalog = None
    warehouse = _resolve_warehouse(args)
    if warehouse:
        from hive_io_experimental_spark.catalog import Catalog

        catalog = Catalog(warehouse)
    spec = ScanSpec(
        table=args.table,
        columns=tuple(args.columns.split(",")) if args.columns else (),
        partition_filter=args.filter or "",
        limit=args.limit,
    )
    hive_input = HiveInput(spark, catalog)
    df = hive_input.read_table(spec)

    t0 = time.perf_counter()
    n_rows = 0
    total_rows_estimate = None
    if print_rows:
        # Buffered print loop — RecordPrinter parity (buffer flush every
        # --record-buffer-flush rows, RecordPrinter.java:40-80).
        buf: list[str] = []
        flush_every = args.record_buffer_flush
        out = sys.stdout
        for row in df.toLocalIterator():
            buf.append(args.separator.join("" if v is None else str(v) for v in row))
            n_rows += 1
            if len(buf) >= flush_every:
                out.write("\n".join(buf) + "\n")
                buf.clear()
        if buf:
            out.write("\n".join(buf) + "\n")
    else:
        # benchmark mode: parse-only (force full materialization, no output)
        n_rows = df.count()
        df.write.format("noop").mode("overwrite").save()
    seconds = time.perf_counter() - t0

    # MB estimate: table bytes scaled by rows-read fraction (the reference
    # estimates from metastore rawSize the same way, Stats.java:92-98).
    tbl_path = args.table if os.path.exists(args.table) else None
    if catalog is not None and catalog.table_exists(args.table):
        tbl_path = catalog.table_location(args.table)
    mb = 0.0
    if tbl_path:
        total_bytes = _table_bytes(tbl_path)
        try:
            total_rows_estimate = spark.read.parquet(tbl_path).count()
        except Exception:
            total_rows_estimate = None
        frac = (
            min(1.0, n_rows / total_rows_estimate)
            if total_rows_estimate
            else 1.0
        )
        mb = total_bytes * frac / 1e6
    threads = args.threads or int(
        os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4)
    )
    rows_per_s = n_rows / seconds if seconds > 0 else 0.0
    mb_per_s = mb / seconds if seconds > 0 else 0.0
    stats_line = (
        f"{n_rows},{threads},{mb:.2f},{seconds:.3f},{rows_per_s:.1f},{mb_per_s:.2f}"
    )
    print(
        f"# rows={n_rows} threads={threads} MB={mb:.2f} seconds={seconds:.3f} "
        f"rows/s={rows_per_s:.1f} MB/s={mb_per_s:.2f}",
        file=sys.stderr,
    )
    if args.append_stats_to:
        new = not os.path.exists(args.append_stats_to)
        with open(args.append_stats_to, "a") as f:
            if new:
                f.write("rows,threads,MB,seconds,rows_per_s,MB_per_s\n")
            f.write(stats_line + "\n")
    if stop_session:
        spark.stop()
    return 0


def cmd_write(args: argparse.Namespace, stop_session: bool = True) -> int:
    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec

    warehouse = _resolve_warehouse(args)
    if not warehouse:
        raise SystemExit("write requires --warehouse or --namespaces-file")
    spark = _build_spark(args.threads)
    catalog = Catalog(warehouse)
    df = spark.read.parquet(args.source)
    part_values = {}
    if args.partition:
        for kv in args.partition.split(","):
            k, _, v = kv.partition("=")
            part_values[k.strip()] = v.strip()
    out = HiveOutput(spark, catalog)
    out.write_table(
        WriteSpec(
            table=args.table,
            partition_values=part_values,
            drop_partition=args.drop_partition,
        ),
        df,
    )
    print(f"# wrote {args.source} -> {args.table} partition={part_values}",
          file=sys.stderr)
    # tailer Stats CSV shape (rows,threads,MB,sec,rows/s,MB/s —
    # Stats.java:133-151), metered during the write job (WriteMeter)
    if out.last_write_stats is not None:
        # same fallback as cmd_scan: without --threads, report the
        # session's actual parallelism instead of rendering 'None'
        threads = args.threads or int(
            os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4)
        )
        print(
            "# write stats rows,threads,MB,seconds,rows/s,MB/s: "
            + out.last_write_stats.csv_line(threads),
            file=sys.stderr,
        )
    if stop_session:
        spark.stop()
    return 0


def cmd_analyze(args: argparse.Namespace, stop_session: bool = True) -> int:
    """ANALYZE TABLE: compute + persist column stats, print them."""
    from hive_io_experimental_spark.analyze import analyze_table
    from hive_io_experimental_spark.catalog import Catalog

    warehouse = _resolve_warehouse(args)
    if not warehouse:
        raise SystemExit("analyze requires --warehouse or --namespaces-file")
    spark = _build_spark(args.threads)
    catalog = Catalog(warehouse)
    columns = tuple(args.columns.split(",")) if args.columns else ()
    if args.ranges:
        from hive_io_experimental_spark.analyze import (
            analyze_partition_ranges,
        )

        n = analyze_partition_ranges(
            spark, catalog, args.table, tuple(args.ranges.split(","))
        )
        print(f"# zone maps stamped on {n} partitions", file=sys.stderr)
    if args.blooms:
        from hive_io_experimental_spark.analyze import (
            analyze_partition_blooms,
        )

        n = analyze_partition_blooms(
            spark, catalog, args.table, tuple(args.blooms.split(","))
        )
        print(f"# bloom indexes stamped on {n} partitions", file=sys.stderr)
    stats = analyze_table(spark, catalog, args.table, columns,
                          exact=not args.approx)
    print("column\tn_nonnull\tn_distinct\tmin\tmax")
    for name in sorted(stats):
        s = stats[name]
        print(f"{name}\t{s['n_nonnull']}\t{s['n_distinct']}"
              f"\t{s['min']}\t{s['max']}")
    if stop_session:
        spark.stop()
    return 0


def cmd_diff(args: argparse.Namespace, stop_session: bool = True) -> int:
    """Print the CDC rows between two snapshots of a versioned table."""
    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.operators.diff import snapshot_diff

    warehouse = _resolve_warehouse(args)
    if not warehouse:
        raise SystemExit("diff requires --warehouse or --namespaces-file")
    spark = _build_spark(args.threads)
    catalog = Catalog(warehouse)
    keys = tuple(args.keys.split(",")) if args.keys else ()
    changes = snapshot_diff(
        spark, catalog, args.table, args.from_version, args.to_version,
        key_cols=keys,
    )
    n = 0
    for row in changes.toLocalIterator():
        print(args.separator.join("" if v is None else str(v) for v in row))
        n += 1
    print(f"# {n} change rows {args.table} "
          f"v{args.from_version}->v{args.to_version}", file=sys.stderr)
    if stop_session:
        spark.stop()
    return 0


def cmd_sql(args: argparse.Namespace, stop_session: bool = True) -> int:
    """Ad-hoc SQL over the warehouse: catalog tables become views, the
    query streams to stdout (bounded by --limit)."""
    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.input import register_catalog_views

    warehouse = _resolve_warehouse(args)
    if not warehouse:
        raise SystemExit("sql requires --warehouse or --namespaces-file")
    spark = _build_spark(args.threads)
    names = register_catalog_views(spark, Catalog(warehouse))
    df = spark.sql(args.query)
    if args.explain:
        print(df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        ))
        if stop_session:
            spark.stop()
        return 0
    if args.limit:
        df = df.limit(args.limit)
    print(args.separator.join(df.columns))
    n = 0
    for row in df.toLocalIterator():
        print(args.separator.join("" if v is None else str(v) for v in row))
        n += 1
    print(f"# {n} rows over views: {', '.join(names)}", file=sys.stderr)
    if stop_session:
        spark.stop()
    return 0


def cmd_fsck(args: argparse.Namespace) -> int:
    """Metadata vs filesystem consistency report (no Spark session)."""
    import json as _json

    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.operators.maintenance import catalog_fsck

    warehouse = _resolve_warehouse(args)
    if not warehouse:
        raise SystemExit("fsck requires --warehouse or --namespaces-file")
    report = catalog_fsck(Catalog(warehouse))
    print(_json.dumps(report, indent=1))
    clean = not any(report.values())
    print(f"# {'clean' if clean else 'DRIFT FOUND'}", file=sys.stderr)
    if getattr(args, "vacuum", False):
        from hive_io_experimental_spark.operators.maintenance import (
            vacuum_orphans,
        )

        vac = vacuum_orphans(Catalog(warehouse), dry_run=False)
        print(
            f"# vacuumed {vac['deleted']} orphan partition dirs",
            file=sys.stderr,
        )
    return 0 if clean else 1


def cmd_check(args: argparse.Namespace, stop_session: bool = True) -> int:
    """Audit a table against a JSON rules file (expectations.py forms)."""
    import json as _json

    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.input import HiveInput, ScanSpec
    from hive_io_experimental_spark.operators.expectations import (
        check_expectations,
    )

    with open(args.rules) as f:
        rules = _json.load(f)
    spark = _build_spark(args.threads)
    warehouse = _resolve_warehouse(args)
    if warehouse:
        df = HiveInput(spark, Catalog(warehouse)).read_table(
            ScanSpec(table=args.table)
        )
    else:  # raw parquet path mode, like tail
        df = spark.read.parquet(args.table)
    rows = check_expectations(df, rules).collect()
    failed = 0
    for r in rows:
        mark = "ok  " if r["passed"] else "FAIL"
        failed += 0 if r["passed"] else 1
        print(f"{mark} {r['column']}\t{r['rule']}\t{r['n_violations']}")
    print(f"# {len(rows) - failed}/{len(rows)} expectations passed",
          file=sys.stderr)
    if stop_session:
        spark.stop()
    return 0 if failed == 0 else 1


def _table_df(spark, args, table: str):
    """db.table through the catalog when a warehouse is given, else a raw
    parquet path — same resolution as cmd_check."""
    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.input import HiveInput, ScanSpec

    warehouse = _resolve_warehouse(args)
    if warehouse:
        return HiveInput(spark, Catalog(warehouse)).read_table(
            ScanSpec(table=table)
        )
    return spark.read.parquet(table)


def cmd_dedup(args: argparse.Namespace, stop_session: bool = True) -> int:
    """Exact dedup of a table, or incremental dedup against a corpus.

    Without --against: print (text_hash, kept_id, dup_count) groups.
    With --against: print surviving (id, fp) of the incoming batch after
    batch-internal dedup + corpus fingerprint exclusion.
    With --semantic: SemDeDup cluster-partitioned embedding dedup —
    print (doc_id, kept_id, cosine) for every dropped document."""
    from hive_io_experimental_spark.operators import dedup as dedup_ops

    spark = _build_spark(args.threads)
    incoming = _table_df(spark, args, args.table)
    if args.semantic:
        out = dedup_ops.semantic_dedup(
            incoming,
            threshold=args.threshold,
            centroid_stride=args.centroid_stride,
            vec_col=args.vec_col,
            id_col=args.id_col,
        )
    elif args.against:
        out = dedup_ops.dedup_against_corpus(
            incoming,
            _table_df(spark, args, args.against),
            text_col=args.text_col,
            id_col=args.id_col,
        )
    else:
        out = dedup_ops.exact_dedup(
            incoming, text_col=args.text_col, id_col=args.id_col
        )
    print(args.separator.join(out.columns))
    n = 0
    for row in out.toLocalIterator():
        print(args.separator.join("" if v is None else str(v) for v in row))
        n += 1
    print(f"# {n} rows", file=sys.stderr)
    if stop_session:
        spark.stop()
    return 0


def cmd_spans(args: argparse.Namespace, stop_session: bool = True) -> int:
    """Exact-substring (span) duplication over a corpus.

    --mode stats: per-group duplicated-token accounting (integers);
    --mode hot:   hottest cross-document spans;
    --mode strip: the corpus rewritten with duplicated-span tokens removed."""
    from pyspark.sql import functions as F

    from hive_io_experimental_spark.operators import dedup as dedup_ops

    spark = _build_spark(args.threads)
    df = _table_df(spark, args, args.table)
    if args.mode == "stats":
        out = dedup_ops.span_dedup_stats(
            df, window_tokens=args.window, min_docs=args.min_docs,
            text_col=args.text_col, id_col=args.id_col,
            group_col=args.group_col,
        )
    elif args.mode == "hot":
        # "hottest" presentation order belongs to the CLI, not the
        # operator (which returns unsorted); sort-then-limit keeps the
        # cut deterministic
        out = dedup_ops.duplicated_spans(
            df, window_tokens=args.window, min_docs=args.min_docs,
            text_col=args.text_col, id_col=args.id_col,
        ).orderBy(
            F.col("n_docs").desc(), F.col("span_hash").asc()
        ).limit(args.limit)
    else:
        out = dedup_ops.strip_duplicated_spans(
            df, window_tokens=args.window, min_docs=args.min_docs,
            text_col=args.text_col, id_col=args.id_col,
        )
    print(args.separator.join(out.columns))
    n = 0
    for row in out.toLocalIterator():
        print(args.separator.join("" if v is None else str(v) for v in row))
        n += 1
    print(f"# {n} rows", file=sys.stderr)
    if stop_session:
        spark.stop()
    return 0


def cmd_index(args: argparse.Namespace, stop_session: bool = True) -> int:
    """Persisted ANN index lifecycles from the CLI, tier-selected with
    ``--tier lsh|pq|ivfpq`` (every code-holding tier appends):

    build  — encode/bucket the corpus and persist the index tables
             (LSH: buckets+meta, --planes; PQ: codes+codebooks,
             --stride/--max-codes; IVF-PQ: codes+codebooks+centroids+
             lists, --stride/--pq-stride/--max-codes);
    append — fold new vectors in under the STORED geometry (snapshot
             append, idempotent on re-delivery; IVF-PQ torn appends
             self-repair on retry);
    query  — top-k served from the stored tables only (LSH multiprobe
             rescore; PQ/IVF-PQ ADC over stored codes — raw embeddings
             never rescanned);
    check  — one-row consistency proof: served == direct operator.
    """
    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.input import HiveInput, ScanSpec
    from hive_io_experimental_spark.operators import similarity

    warehouse = _resolve_warehouse(args)
    if not warehouse:
        raise SystemExit("index requires --warehouse or --namespaces-file")
    spark = _build_spark(args.threads)
    cat = Catalog(warehouse)
    # repair --detect-only never touches the corpus — and its natural
    # use case (sizing a tear after the corpus table was erased or
    # moved) must not die resolving a frame the verb won't read
    if args.action == "repair" and args.detect_only:
        corpus = None
    elif not args.table:
        raise SystemExit(
            f"index {args.action} requires --table (the corpus)"
        )
    else:
        corpus = _table_df(spark, args, args.table)
    tier = args.tier

    def _codes_summary() -> "DataFrame":
        inp = HiveInput(spark, cat)
        n_codes = inp.read_table(ScanSpec(table=args.index)).count()
        n_cb = inp.read_table(
            ScanSpec(table=f"{args.index}_codebooks")
        ).count()
        return spark.createDataFrame(
            [(args.index, tier, int(n_codes), int(n_cb))],
            "index string, tier string, n_codes long, n_codebook_rows long",
        )

    if args.action == "build":
        if tier == "lsh":
            similarity.lsh_build_index(
                spark, cat, args.index, corpus, num_planes=args.planes,
                vec_col=args.vec_col, id_col=args.id_col,
            )
            out = HiveInput(spark, cat).read_table(
                ScanSpec(table=f"{args.index}_meta")
            )
        elif tier == "pq":
            similarity.pq_build_index(
                spark, cat, args.index, corpus,
                num_subspaces=args.subspaces,
                centroid_stride=args.stride, max_codes=args.max_codes,
                vec_col=args.vec_col, id_col=args.id_col,
            )
            out = _codes_summary()
        else:  # ivfpq
            similarity.ivf_pq_build_index(
                spark, cat, args.index, corpus,
                centroid_stride=args.stride,
                num_subspaces=args.subspaces, pq_stride=args.pq_stride,
                max_codes=args.max_codes,
                vec_col=args.vec_col, id_col=args.id_col,
            )
            out = _codes_summary()
    elif args.action == "append":
        appender = {
            "lsh": similarity.lsh_append_to_index,
            "pq": similarity.pq_append_to_index,
            "ivfpq": similarity.ivf_pq_append_to_index,
        }[tier]
        version = appender(
            spark, cat, args.index, corpus,
            vec_col=args.vec_col, id_col=args.id_col,
        )
        print(f"# index {args.index} at version {version}", file=sys.stderr)
        if tier == "lsh":
            out = HiveInput(spark, cat).read_table(
                ScanSpec(table=f"{args.index}_meta")
            )
        else:
            out = _codes_summary()
    elif args.action == "query":
        if not args.queries:
            raise SystemExit("index query requires --queries")
        qdf = _table_df(spark, args, args.queries)
        if tier == "lsh":
            out = similarity.lsh_query_index(
                spark, cat, args.index, corpus, qdf,
                k=args.k, probe_bits=args.probe_bits,
                vec_col=args.vec_col, id_col=args.id_col,
            )
        elif tier == "pq":
            out = similarity.pq_query_index(
                spark, cat, args.index, qdf,
                k=args.k, num_subspaces=args.subspaces,
                vec_col=args.vec_col, id_col=args.id_col,
            )
        else:
            out = similarity.ivf_pq_query_index(
                spark, cat, args.index, qdf,
                k=args.k, nprobe=args.nprobe,
                num_subspaces=args.subspaces,
                vec_col=args.vec_col, id_col=args.id_col,
            )
    elif args.action == "repair":
        # torn-APPEND completion for the only tier whose append moves
        # two tables; --table is the corpus the vectors are completed
        # from (--detect-only reports the id diff without writing)
        if tier != "ivfpq":
            raise SystemExit(
                "index repair applies to --tier ivfpq only — the LSH "
                "and PQ appends move one table and cannot tear"
            )
        out = similarity.ivf_pq_index_repair(
            spark, cat, args.index, corpus,
            vec_col=args.vec_col, id_col=args.id_col,
        )
    else:  # check
        if not args.queries:
            raise SystemExit("index check requires --queries")
        qdf = _table_df(spark, args, args.queries)
        if tier == "lsh":
            out = similarity.lsh_index_consistency_check(
                spark, cat, args.index, corpus, qdf,
                k=args.k, probe_bits=args.probe_bits,
                vec_col=args.vec_col, id_col=args.id_col,
            )
        elif tier == "pq":
            out = similarity.pq_index_consistency_check(
                spark, cat, args.index, corpus, qdf,
                k=args.k, num_subspaces=args.subspaces,
                centroid_stride=args.stride, max_codes=args.max_codes,
                vec_col=args.vec_col, id_col=args.id_col,
            )
        else:
            out = similarity.ivf_pq_index_consistency_check(
                spark, cat, args.index, corpus, qdf,
                k=args.k, nprobe=args.nprobe,
                centroid_stride=args.stride,
                num_subspaces=args.subspaces, pq_stride=args.pq_stride,
                max_codes=args.max_codes,
                vec_col=args.vec_col, id_col=args.id_col,
            )
    print(args.separator.join(out.columns))
    n = 0
    for row in out.toLocalIterator():
        print(args.separator.join("" if v is None else str(v) for v in row))
        n += 1
    print(f"# {n} rows", file=sys.stderr)
    if stop_session:
        spark.stop()
    return 0


def cmd_erase(args: argparse.Namespace, stop_session: bool = True) -> int:
    """Key-addressed DELETE (right-to-be-forgotten) from a catalog table:
    every row whose --key-col value is in --values is removed, wherever
    it lives; prints the audit record (partitions touched, rows erased).
    """
    from pyspark.sql import types as T

    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.operators.merge import erase_keys

    spark = _build_spark(args.threads)
    warehouse = _resolve_warehouse(args)
    if not warehouse:
        raise SystemExit("erase requires --warehouse or --namespaces-file")
    cat = Catalog(warehouse)
    values = [v for v in args.values.split(",") if v]
    # type the keys from the TABLE's schema, never by guessing from the
    # literal: an all-digit value against a STRING key column ('0123' vs
    # '123') must compare as a string, or the wrong rows get erased
    schema = cat.get_schema(args.table)
    col_type = dict(schema.data_fields).get(args.key_col)
    if col_type is None:
        raise SystemExit(
            f"--key-col {args.key_col!r} is not a data column of {args.table}"
        )
    if isinstance(col_type, (T.LongType, T.IntegerType, T.ShortType)):
        rows = [(int(v),) for v in values]
        dtype = T.LongType()
    elif isinstance(col_type, T.StringType):
        rows = [(v,) for v in values]
        dtype = T.StringType()
    else:
        raise SystemExit(
            f"erase supports integer or string key columns, "
            f"{args.key_col!r} is {col_type.simpleString()}"
        )
    keys = spark.createDataFrame(
        rows, schema=T.StructType([T.StructField(args.key_col, dtype)])
    )
    stats = erase_keys(
        spark, cat, args.table, keys,
        key_cols=(args.key_col,), partition_col=args.partition_col,
    )
    print(
        f"erased {stats['n_erased']} rows across "
        f"{stats['n_partitions']} partitions"
    )
    if stop_session:
        spark.stop()
    return 0


def cmd_search(args: argparse.Namespace, stop_session: bool = True) -> int:
    """Keyword search over a corpus, or print its inverted index.

    With --terms: conjunctive (AND) search ranked by total term
    frequency, or relevance-ranked (OR) BM25 with --ranker bm25.
    Adding --embeddings + --query-vec-id upgrades to HYBRID search:
    the BM25 leg and an exact-cosine leg against that stored vector,
    fused by reciprocal-rank fusion (operators/retrieval.py).
    Without --terms: the term -> (df, tf_total, postings) index, the
    posting prefix capped at --max-postings ids."""
    from pyspark.sql import functions as F

    from hive_io_experimental_spark.operators import retrieval as retrieval_ops
    from hive_io_experimental_spark.operators import text as text_ops

    spark = _build_spark(args.threads)
    df = _table_df(spark, args, args.table)
    if args.embeddings and not args.terms:
        print("search: --embeddings requires --terms (hybrid search "
              "fuses a keyword leg and a vector leg)", file=sys.stderr)
        if stop_session:
            spark.stop()
        return 2
    if args.terms:
        terms = [t for t in args.terms.split(",") if t]
        if args.embeddings:
            emb = _table_df(spark, args, args.embeddings)
            qrow = (
                emb.filter(F.col(args.vec_id_col) == args.query_vec_id)
                .select(args.vec_col)
                .first()
            )
            if qrow is None:
                print(
                    f"search: no row with {args.vec_id_col} = "
                    f"{args.query_vec_id} in {args.embeddings}",
                    file=sys.stderr,
                )
                if stop_session:
                    spark.stop()
                return 2
            out = retrieval_ops.hybrid_topk_rrf(
                df, emb, terms, list(qrow[0]),
                k=args.top_k,
                candidate_k=max(50, args.top_k),
                text_col=args.text_col, doc_id_col=args.id_col,
                vec_col=args.vec_col, vec_id_col=args.vec_id_col,
            )
        elif args.ranker == "bm25":
            out = text_ops.bm25_search(
                df, terms, text_col=args.text_col, id_col=args.id_col,
                top_k=args.top_k,
            )
        elif args.ranker == "prf":
            out = text_ops.bm25_prf_search(
                df, terms, fb_docs=args.fb_docs, fb_terms=args.fb_terms,
                text_col=args.text_col, id_col=args.id_col,
                top_k=args.top_k,
            )
        else:
            out = text_ops.keyword_search(
                df, terms, text_col=args.text_col, id_col=args.id_col,
                top_k=args.top_k,
            )
    else:
        out = text_ops.inverted_index(
            df, text_col=args.text_col, id_col=args.id_col,
            max_postings=args.max_postings,
        )
    print(args.separator.join(out.columns))
    n = 0
    for row in out.toLocalIterator():
        print(args.separator.join("" if v is None else str(v) for v in row))
        n += 1
    print(f"# {n} rows", file=sys.stderr)
    if stop_session:
        spark.stop()
    return 0


def cmd_decontaminate(
    args: argparse.Namespace, stop_session: bool = True
) -> int:
    """Clear a training table against a benchmark corpus on winnowing
    fingerprints; print flagged docs, exit 1 if any are contaminated
    (gate semantics, like cmd_check)."""
    from hive_io_experimental_spark.operators import text as text_ops

    spark = _build_spark(args.threads)
    out = text_ops.benchmark_decontamination(
        _table_df(spark, args, args.table),
        _table_df(spark, args, args.benchmark),
        text_col=args.text_col,
        id_col=args.id_col,
        min_shared=args.min_shared,
    )
    if not args.all:
        out = out.filter(out.contaminated)
    print(args.separator.join(out.columns))
    n_bad = 0
    for row in out.toLocalIterator():
        print(args.separator.join("" if v is None else str(v) for v in row))
        n_bad += 1 if row["contaminated"] else 0
    print(f"# {n_bad} contaminated docs", file=sys.stderr)
    if stop_session:
        spark.stop()
    return 0 if n_bad == 0 else 1


def cmd_tokenize(args: argparse.Namespace, stop_session: bool = True) -> int:
    """Persisted BPE tokenizer lifecycle from the CLI (the index
    command's shape, for the vocab artifact):

    train — learn merges on the corpus and persist merges + meta catalog
            tables (stamped with a shared build_id);
    apply — per-document BPE token counts from the STORED vocab (routes
            to the literal or Arrow applier by merge-list size);
    check — one-row proof stored-vocab serving equals retrain+apply
            (merge lists AND segmentations; exit 1 on any mismatch).
    """
    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.input import HiveInput, ScanSpec
    from hive_io_experimental_spark.operators import text as text_ops

    warehouse = _resolve_warehouse(args)
    if not warehouse:
        raise SystemExit("tokenize requires --warehouse or --namespaces-file")
    spark = _build_spark(args.threads)
    cat = Catalog(warehouse)
    docs = _table_df(spark, args, args.table)
    rc = 0
    if args.action == "train":
        kwargs = {}
        if args.max_vocab is not None:
            kwargs["max_vocab"] = args.max_vocab
        text_ops.bpe_build_vocab(
            spark, cat, args.vocab, docs, num_merges=args.num_merges,
            text_col=args.text_col, **kwargs,
        )
        out = HiveInput(spark, cat).read_table(
            ScanSpec(table=f"{args.vocab}_meta")
        )
    elif args.action == "apply":
        out = text_ops.bpe_segment_from_vocab(
            spark, cat, args.vocab, docs,
            text_col=args.text_col, id_col=args.id_col,
        )
    else:  # check
        out = text_ops.bpe_vocab_consistency_check(
            spark, cat, args.vocab, docs,
            text_col=args.text_col, id_col=args.id_col,
        )
    print(args.separator.join(out.columns))
    for row in out.toLocalIterator():
        print(args.separator.join("" if v is None else str(v) for v in row))
        if args.action == "check" and (
            row["n_merge_mismatch"] or row["n_segment_mismatch"]
        ):
            rc = 1
    if stop_session:
        spark.stop()
    return rc


def cmd_classify(args: argparse.Namespace, stop_session: bool = True) -> int:
    """Persisted Naive Bayes classifier lifecycle from the CLI (the
    tokenize command's shape, for the routing model):

    train  — closed-form NB fit, persisted as stamped catalog tables;
    update — fold a NEW labeled batch into the stored model EXACTLY
             (integer sufficient-statistics merge; no corpus rescan —
             the nightly-delta verb);
    score  — label documents from the STORED model (prior-only for
             tokenless docs);
    check  — one-row proof stored-model routing equals retrain+score
             (priors, likelihoods AND scores; exit 1 on any mismatch).
    """
    from hive_io_experimental_spark.catalog import Catalog
    from hive_io_experimental_spark.input import HiveInput, ScanSpec
    from hive_io_experimental_spark.operators import text as text_ops

    warehouse = _resolve_warehouse(args)
    if not warehouse:
        raise SystemExit("classify requires --warehouse or --namespaces-file")
    spark = _build_spark(args.threads)
    cat = Catalog(warehouse)
    docs = _table_df(spark, args, args.table)
    rc = 0
    if args.action == "train":
        text_ops.nb_build_model(
            spark, cat, args.model, docs,
            text_col=args.text_col, label_col=args.label_col,
        )
        out = HiveInput(spark, cat).read_table(
            ScanSpec(table=f"{args.model}_meta")
        )
    elif args.action == "update":
        bid = text_ops.nb_update_model(
            spark, cat, args.model, docs,
            text_col=args.text_col, label_col=args.label_col,
        )
        if bid is None:
            print("# empty batch: model unchanged", file=sys.stderr)
        out = HiveInput(spark, cat).read_table(
            ScanSpec(table=f"{args.model}_meta")
        )
    elif args.action == "score":
        out = text_ops.nb_score_from_model(
            spark, cat, args.model, docs,
            text_col=args.text_col, id_col=args.id_col,
        )
    else:  # check
        out = text_ops.nb_model_consistency_check(
            spark, cat, args.model, docs,
            text_col=args.text_col, label_col=args.label_col,
            id_col=args.id_col,
        )
    print(args.separator.join(out.columns))
    for row in out.toLocalIterator():
        print(args.separator.join("" if v is None else str(v) for v in row))
        if args.action == "check" and (
            row["n_prior_mismatch"] or row["n_likelihood_mismatch"]
            or row["n_score_mismatch"]
        ):
            rc = 1
    if stop_session:
        spark.stop()
    return rc


def cmd_snapshots(args: argparse.Namespace) -> int:
    """List (and optionally expire) a versioned table's snapshot history.

    Catalog-only — no Spark session: snapshot metadata is driver-sized by
    design, so inspection must not cost a JVM spin-up.
    """
    import datetime as _dt

    from hive_io_experimental_spark.catalog import Catalog

    catalog = Catalog(args.warehouse)
    if getattr(args, "rollback_to", None) is not None:
        new_v = catalog.rollback_to_version(args.table, args.rollback_to)
        print(
            f"# rolled back to v{args.rollback_to} as new v{new_v}",
            file=sys.stderr,
        )
    if args.expire_keep_last is not None:
        deleted = catalog.expire_snapshots(
            args.table, keep_last=args.expire_keep_last
        )
        print(f"# expired {len(deleted)} unreferenced dirs", file=sys.stderr)
    current = catalog.current_version(args.table)
    for s in catalog.list_snapshots(args.table):
        ts = _dt.datetime.fromtimestamp(
            s["committed_at"], tz=_dt.timezone.utc
        ).isoformat(timespec="seconds")
        marker = "*" if s["version"] == current else " "
        print(
            f"{marker}v{s['version']}\t{ts}\t{s['n_partitions']} parts"
            f"\t{s['note']}"
        )
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="hivetail", description="scan/limit/print + write CLI"
    )
    sub = p.add_subparsers(dest="command", required=True)

    def add_common(sp):
        sp.add_argument("--table", required=True,
                        help="db.table (with --warehouse) or parquet path")
        sp.add_argument("--warehouse", help="warehouse dir with _catalog.json")
        sp.add_argument("--namespaces-file",
                        help="JSON file of named warehouses "
                             '({"data": {name: [path, ...]}}); overrides '
                             "--warehouse (NamespaceOptions parity)")
        sp.add_argument("--namespace", default="silver",
                        help="namespace name to resolve (default: silver)")
        sp.add_argument("--columns", help="comma-separated projection")
        sp.add_argument("--filter", help="partition filter expression")
        sp.add_argument("--limit", type=int, default=None,
                        help="global row limit (TailerCmd --limit)")
        sp.add_argument("--separator", default="\t",
                        help="column separator (default tab)")
        sp.add_argument("--record-buffer-flush", type=int, default=1000,
                        help="rows buffered between stdout flushes")
        sp.add_argument("--threads", type=int, default=None,
                        help="local[] parallelism (Spark tasks do the rest)")
        sp.add_argument("--append-stats-to",
                        help="append CSV stats line to this file")

    tail = sub.add_parser("tail", help="scan and print rows")
    add_common(tail)

    bench = sub.add_parser("benchmark", help="parse-only scan throughput")
    add_common(bench)

    wr = sub.add_parser("write", help="write parquet source into a catalog table")
    wr.add_argument("--table", required=True)
    wr.add_argument("--warehouse")
    wr.add_argument("--namespaces-file",
                    help="JSON file of named warehouses; overrides --warehouse")
    wr.add_argument("--namespace", default="silver")
    wr.add_argument("--source", required=True, help="source parquet path")
    wr.add_argument("--partition", help="k=v[,k=v...] static partition spec")
    wr.add_argument("--drop-partition", action="store_true")
    wr.add_argument("--threads", type=int, default=None)

    sub.add_parser(
        "conf-options",
        help="dump the engine option registry (AllOptions parity)",
    )

    an = sub.add_parser(
        "analyze", help="compute + persist column statistics for a table"
    )
    an.add_argument("--table", required=True)
    an.add_argument("--warehouse")
    an.add_argument("--namespaces-file")
    an.add_argument("--namespace", default="silver")
    an.add_argument("--columns", help="comma-separated subset (default all)")
    an.add_argument("--approx", action="store_true",
                    help="approx_count_distinct instead of exact ndv")
    an.add_argument("--ranges",
                    help="also stamp per-partition [min,max] zone maps "
                         "for these comma-separated columns")
    an.add_argument("--blooms",
                    help="also stamp per-partition bloom indexes (point-"
                         "lookup skipping) for these comma-separated columns")
    an.add_argument("--threads", type=int, default=None)

    di = sub.add_parser(
        "diff", help="print CDC rows between two snapshots"
    )
    di.add_argument("--table", required=True)
    di.add_argument("--warehouse")
    di.add_argument("--namespaces-file")
    di.add_argument("--namespace", default="silver")
    di.add_argument("--from-version", type=int, required=True)
    di.add_argument("--to-version", type=int, required=True)
    di.add_argument("--keys", help="comma-separated key columns (keyed CDC)")
    di.add_argument("--separator", default="\t")
    di.add_argument("--threads", type=int, default=None)

    sq = sub.add_parser("sql", help="run SQL over the warehouse's tables")
    sq.add_argument("--query", required=True)
    sq.add_argument("--warehouse")
    sq.add_argument("--namespaces-file")
    sq.add_argument("--namespace", default="silver")
    sq.add_argument("--limit", type=int, default=1000,
                    help="row cap for stdout (0 = unlimited)")
    sq.add_argument("--explain", action="store_true",
                    help="print the formatted physical plan instead of rows")
    sq.add_argument("--separator", default="\t")
    sq.add_argument("--threads", type=int, default=None)

    fs = sub.add_parser(
        "fsck", help="metadata vs filesystem consistency report"
    )
    fs.add_argument("--vacuum", action="store_true",
                    help="delete the orphan partition dirs the report "
                         "names (fsck's explicit repair arm)")
    fs.add_argument("--warehouse")
    fs.add_argument("--namespaces-file")
    fs.add_argument("--namespace", default="silver")

    ck = sub.add_parser(
        "check", help="audit a table against a JSON expectations file"
    )
    ck.add_argument("--table", required=True,
                    help="db.table (with --warehouse) or parquet path")
    ck.add_argument("--rules", required=True,
                    help="JSON list of expectation rule objects")
    ck.add_argument("--warehouse")
    ck.add_argument("--namespaces-file")
    ck.add_argument("--namespace", default="silver")
    ck.add_argument("--threads", type=int, default=None)

    dd = sub.add_parser(
        "dedup", help="exact dedup, or incremental dedup against a corpus"
    )
    dd.add_argument("--table", required=True,
                    help="db.table (with --warehouse) or parquet path")
    dd.add_argument("--against", default=None,
                    help="corpus table/path for incremental batch dedup")
    dd.add_argument("--text-col", default="text")
    dd.add_argument("--id-col", default="doc_id")
    dd.add_argument("--semantic", action="store_true",
                    help="SemDeDup semantic dedup over an embedding column")
    dd.add_argument("--vec-col", default="embedding")
    dd.add_argument("--threshold", type=float, default=0.65)
    dd.add_argument("--centroid-stride", type=int, default=None,
                    help="None = balanced auto-stride (sqrt(2n), floor 50)")
    dd.add_argument("--warehouse")
    dd.add_argument("--namespaces-file")
    dd.add_argument("--namespace", default="silver")
    dd.add_argument("--separator", default="\t")
    dd.add_argument("--threads", type=int, default=None)

    ix = sub.add_parser(
        "index",
        help="persisted ANN index (lsh/pq/ivfpq): build / append / "
             "query / check / repair",
    )
    ix.add_argument("action",
                    choices=("build", "append", "query", "check", "repair"))
    ix.add_argument("--detect-only", action="store_true",
                    help="repair: report the lists-vs-codes id diff "
                         "without completing it")
    ix.add_argument("--tier", choices=("lsh", "pq", "ivfpq"),
                    default="lsh",
                    help="index tier (default lsh); every tier appends")
    ix.add_argument("--subspaces", type=int, default=4,
                    help="PQ subspace count (pq/ivfpq)")
    ix.add_argument("--stride", type=int, default=50,
                    help="centroid/codebook sampling stride (pq/ivfpq "
                         "build + check)")
    ix.add_argument("--pq-stride", type=int, default=5,
                    help="PQ codebook stride (ivfpq build + check)")
    ix.add_argument("--max-codes", type=int, default=128,
                    help="codebook size cap per subspace (pq/ivfpq)")
    ix.add_argument("--nprobe", type=int, default=2,
                    help="probed inverted lists per query (ivfpq)")
    ix.add_argument("--table",
                    help="corpus db.table (with --warehouse) or parquet "
                         "path holding the embedding column (required "
                         "for every action except repair --detect-only)")
    ix.add_argument("--index", required=True,
                    help="index table name (db.table) in the warehouse")
    ix.add_argument("--queries",
                    help="query-vectors table/path (query and check)")
    ix.add_argument("--planes", type=int, default=None,
                    help="hyperplane count (build; default auto-sizes "
                         "from the corpus)")
    ix.add_argument("--k", type=int, default=10)
    ix.add_argument("--probe-bits", type=int, default=1,
                    help="0 single-probe, 1/2 = Hamming probe depth")
    ix.add_argument("--vec-col", default="embedding")
    ix.add_argument("--id-col", default="vec_id")
    ix.add_argument("--warehouse")
    ix.add_argument("--namespaces-file")
    ix.add_argument("--namespace", default="silver")
    ix.add_argument("--separator", default="\t")
    ix.add_argument("--threads", type=int, default=None)

    sp = sub.add_parser(
        "spans",
        help="exact-substring span duplication: stats / hot spans / strip",
    )
    sp.add_argument("--table", required=True,
                    help="db.table (with --warehouse) or parquet path")
    sp.add_argument("--mode", choices=("stats", "hot", "strip"),
                    default="stats")
    sp.add_argument("--window", type=int, default=None,
                    help="token-window width (default: session conf)")
    sp.add_argument("--min-docs", type=int, default=2)
    sp.add_argument("--limit", type=int, default=20,
                    help="rows for --mode hot")
    sp.add_argument("--group-col", default="source",
                    help="grouping column for --mode stats")
    sp.add_argument("--text-col", default="text")
    sp.add_argument("--id-col", default="doc_id")
    sp.add_argument("--warehouse")
    sp.add_argument("--namespaces-file")
    sp.add_argument("--namespace", default="silver")
    sp.add_argument("--separator", default="\t")
    sp.add_argument("--threads", type=int, default=None)

    dc = sub.add_parser(
        "decontaminate",
        help="flag training docs sharing winnowing fps with a benchmark",
    )
    dc.add_argument("--table", required=True,
                    help="training db.table or parquet path")
    dc.add_argument("--benchmark", required=True,
                    help="benchmark db.table or parquet path")
    dc.add_argument("--text-col", default="text")
    dc.add_argument("--id-col", default="doc_id")
    dc.add_argument("--min-shared", type=int, default=1)
    dc.add_argument("--all", action="store_true",
                    help="print every doc, not just contaminated ones")
    dc.add_argument("--warehouse")
    dc.add_argument("--namespaces-file")
    dc.add_argument("--namespace", default="silver")
    dc.add_argument("--separator", default="\t")
    dc.add_argument("--threads", type=int, default=None)

    er = sub.add_parser(
        "erase",
        help="key-addressed delete (right-to-be-forgotten) from a table",
    )
    er.add_argument("--table", required=True, help="db.table")
    er.add_argument("--key-col", required=True)
    er.add_argument("--values", required=True,
                    help="comma-separated key values to erase")
    er.add_argument("--partition-col", required=True)
    er.add_argument("--warehouse")
    er.add_argument("--namespaces-file")
    er.add_argument("--namespace", default="silver")
    er.add_argument("--threads", type=int, default=None)

    se = sub.add_parser(
        "search",
        help="keyword / BM25 / hybrid search, or print the inverted index",
    )
    se.add_argument("--table", required=True,
                    help="db.table (with --warehouse) or parquet path")
    se.add_argument("--terms", default=None,
                    help="comma-separated terms; omit to print index")
    se.add_argument("--ranker", choices=("and", "bm25", "prf"),
                    default="and",
                    help="'and' = conjunctive tf-ranked, 'bm25' = "
                         "relevance-ranked OR, 'prf' = BM25 with "
                         "pseudo-relevance-feedback expansion")
    se.add_argument("--fb-docs", type=int, default=5,
                    help="prf: feedback depth (top docs of the seed pass)")
    se.add_argument("--fb-terms", type=int, default=3,
                    help="prf: expansion terms added to the query")
    se.add_argument("--embeddings", default=None,
                    help="embeddings db.table/path: fuse a cosine leg "
                         "against --query-vec-id's vector (hybrid RRF)")
    se.add_argument("--query-vec-id", type=int, default=0)
    se.add_argument("--vec-col", default="embedding")
    se.add_argument("--vec-id-col", default="vec_id")
    se.add_argument("--top-k", type=int, default=50)
    se.add_argument("--max-postings", type=int, default=20)
    se.add_argument("--text-col", default="text")
    se.add_argument("--id-col", default="doc_id")
    se.add_argument("--warehouse")
    se.add_argument("--namespaces-file")
    se.add_argument("--namespace", default="silver")
    se.add_argument("--separator", default="\t")
    se.add_argument("--threads", type=int, default=None)

    tk = sub.add_parser(
        "tokenize",
        help="persisted BPE tokenizer vocab: train / apply / check",
    )
    tk.add_argument("action", choices=("train", "apply", "check"))
    tk.add_argument("--table", required=True,
                    help="documents db.table (with --warehouse) or "
                         "parquet path")
    tk.add_argument("--vocab", required=True,
                    help="vocab table name (db.table) in the warehouse")
    tk.add_argument("--num-merges", type=int, default=30)
    tk.add_argument("--max-vocab", type=int, default=None,
                    help="train: driver-side vocabulary cap (recorded in "
                         "meta; check retrains at the same dial)")
    tk.add_argument("--text-col", default="text")
    tk.add_argument("--id-col", default="doc_id")
    tk.add_argument("--warehouse")
    tk.add_argument("--namespaces-file")
    tk.add_argument("--namespace", default="silver")
    tk.add_argument("--separator", default="\t")
    tk.add_argument("--threads", type=int, default=None)

    cf = sub.add_parser(
        "classify",
        help="persisted Naive Bayes router: train / update / score / "
             "check",
    )
    cf.add_argument("action", choices=("train", "update", "score", "check"))
    cf.add_argument("--table", required=True,
                    help="documents db.table (with --warehouse) or "
                         "parquet path")
    cf.add_argument("--model", required=True,
                    help="model table name (db.table) in the warehouse")
    cf.add_argument("--label-col", default="lang")
    cf.add_argument("--text-col", default="text")
    cf.add_argument("--id-col", default="doc_id")
    cf.add_argument("--warehouse")
    cf.add_argument("--namespaces-file")
    cf.add_argument("--namespace", default="silver")
    cf.add_argument("--separator", default="\t")
    cf.add_argument("--threads", type=int, default=None)

    snap = sub.add_parser(
        "snapshots", help="list a versioned table's snapshot history"
    )
    snap.add_argument("--table", required=True)
    snap.add_argument("--warehouse", required=True)
    snap.add_argument(
        "--expire-keep-last", type=int, default=None,
        help="first expire all but the last N snapshots",
    )
    snap.add_argument(
        "--rollback-to", type=int, default=None,
        help="restore snapshot N's content as a NEW version "
             "(append-only Iceberg rollback; runs before any expire)",
    )
    return p


def main(argv: list[str] | None = None, stop_session: bool = True) -> int:
    args = build_parser().parse_args(argv)
    if args.command == "tail":
        return cmd_tail(args, print_rows=True, stop_session=stop_session)
    if args.command == "benchmark":
        return cmd_tail(args, print_rows=False, stop_session=stop_session)
    if args.command == "write":
        return cmd_write(args, stop_session=stop_session)
    if args.command == "sql":
        return cmd_sql(args, stop_session=stop_session)
    if args.command == "analyze":
        return cmd_analyze(args, stop_session=stop_session)
    if args.command == "diff":
        return cmd_diff(args, stop_session=stop_session)
    if args.command == "fsck":
        return cmd_fsck(args)
    if args.command == "check":
        return cmd_check(args, stop_session=stop_session)
    if args.command == "dedup":
        return cmd_dedup(args, stop_session=stop_session)
    if args.command == "index":
        return cmd_index(args, stop_session=stop_session)
    if args.command == "spans":
        return cmd_spans(args, stop_session=stop_session)
    if args.command == "decontaminate":
        return cmd_decontaminate(args, stop_session=stop_session)
    if args.command == "search":
        return cmd_search(args, stop_session=stop_session)
    if args.command == "erase":
        return cmd_erase(args, stop_session=stop_session)
    if args.command == "tokenize":
        return cmd_tokenize(args, stop_session=stop_session)
    if args.command == "classify":
        return cmd_classify(args, stop_session=stop_session)
    if args.command == "snapshots":
        return cmd_snapshots(args)
    if args.command == "conf-options":
        from hive_io_experimental_spark.conf import all_options_string

        print(all_options_string())
        return 0
    raise AssertionError(args.command)


if __name__ == "__main__":
    raise SystemExit(main())
