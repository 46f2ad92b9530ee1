"""hivetail CLI tests (TailerCmd / OutputCmd parity, SURVEY §3.3)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import types as T

from hive_io_experimental_spark import Catalog, HiveTableSchema
from hive_io_experimental_spark.cli import main


def test_tail_prints_rows_with_separator(spark, sf_dir, capsys, tmp_path):
    stats_file = tmp_path / "stats.csv"
    rc = main(
        [
            "tail",
            "--table", f"{sf_dir}/lineitem.parquet",
            "--columns", "l_orderkey,l_partkey",
            "--limit", "7",
            "--separator", "|",
            "--append-stats-to", str(stats_file),
        ],
        stop_session=False,
    )
    assert rc == 0
    lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert len(lines) == 7
    assert all(len(l.split("|")) == 2 for l in lines)
    stats = stats_file.read_text().strip().splitlines()
    assert stats[0] == "rows,threads,MB,seconds,rows_per_s,MB_per_s"
    assert stats[1].split(",")[0] == "7"


def test_benchmark_mode_counts_without_print(spark, sf_dir, capsys):
    rc = main(
        ["benchmark", "--table", f"{sf_dir}/lineitem.parquet",
         "--columns", "l_orderkey"],
        stop_session=False,
    )
    assert rc == 0
    cap = capsys.readouterr()
    assert cap.out == ""  # no rows printed in benchmark mode
    assert "rows/s=" in cap.err


def test_write_then_tail_catalog_table(spark, sf_dir, warehouse, capsys):
    cat = Catalog(warehouse)
    # region.parquet columns are (r_regionkey int32, r_name string); declare
    # the key column wider (long) to exercise the widening write path too.
    cat.create_table(
        "default.regions",
        HiveTableSchema(
            (
                ("r_regionkey", T.LongType()),
                ("r_name", T.StringType()),
            )
        ),
    )
    rc = main(
        ["write", "--table", "default.regions", "--warehouse", warehouse,
         "--source", f"{sf_dir}/region.parquet"],
        stop_session=False,
    )
    assert rc == 0
    rc = main(
        ["tail", "--table", "default.regions", "--warehouse", warehouse,
         "--columns", "r_name", "--limit", "5"],
        stop_session=False,
    )
    assert rc == 0
    out_lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert len(out_lines) == 5


def test_namespace_file_resolves_warehouse(spark, sf_dir, warehouse, tmp_path,
                                           capsys):
    """--namespaces-file + --namespace resolve the warehouse (TailerCmd
    namespace path, NamespaceOptions parity)."""
    import json

    from hive_io_experimental_spark.cli import resolve_namespace

    ns_file = tmp_path / "namespaces.json"
    ns_file.write_text(json.dumps(
        {"data": {"silver": [warehouse], "gold": ["/nonexistent"]}}
    ))

    assert resolve_namespace(str(ns_file), "silver") == warehouse
    # reference host/port object shape also tolerated
    obj_file = tmp_path / "ns2.json"
    obj_file.write_text(json.dumps(
        {"data": {"silver": [{"warehouse": warehouse}]}}
    ))
    assert resolve_namespace(str(obj_file), "silver") == warehouse

    import pytest

    with pytest.raises(SystemExit):
        resolve_namespace(str(ns_file), "missing")

    cat = Catalog(warehouse)
    cat.create_table(
        "default.ns_regions",
        HiveTableSchema((("r_regionkey", T.LongType()),
                         ("r_name", T.StringType()))),
    )
    rc = main(
        ["write", "--table", "default.ns_regions",
         "--namespaces-file", str(ns_file),
         "--source", f"{sf_dir}/region.parquet"],
        stop_session=False,
    )
    assert rc == 0
    rc = main(
        ["tail", "--table", "default.ns_regions",
         "--namespaces-file", str(ns_file), "--namespace", "silver",
         "--columns", "r_name", "--limit", "3"],
        stop_session=False,
    )
    assert rc == 0
    out_lines = [l for l in capsys.readouterr().out.strip().splitlines() if l]
    assert len(out_lines) == 3


def test_cli_analyze_and_diff(spark, warehouse, capsys):
    """analyze prints + persists stats; diff prints the CDC stream."""
    from pyspark.sql import types as T

    cat = Catalog(warehouse)
    cat.create_table(
        "default.cdc_cli",
        HiveTableSchema((("id", T.LongType()), ("v", T.StringType()))),
        versioned=True,
    )
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec

    out = HiveOutput(spark, cat)
    out.write_table(WriteSpec("default.cdc_cli"),
                    spark.createDataFrame([(1, "a"), (2, "b")],
                                          "id long, v string"))
    out.write_table(WriteSpec("default.cdc_cli"),
                    spark.createDataFrame([(1, "a"), (2, "B"), (3, "c")],
                                          "id long, v string"))

    rc = main(["analyze", "--table", "default.cdc_cli",
               "--warehouse", warehouse], stop_session=False)
    assert rc == 0
    out_text = capsys.readouterr().out
    assert "id\t3\t3\t1\t3" in out_text  # n_nonnull, ndv, min, max
    assert Catalog(warehouse).get_column_stats("default.cdc_cli")["id"][
        "n_distinct"] == 3

    rc = main(["diff", "--table", "default.cdc_cli",
               "--warehouse", warehouse,
               "--from-version", "1", "--to-version", "2",
               "--keys", "id"], stop_session=False)
    assert rc == 0
    lines = sorted(l for l in capsys.readouterr().out.strip().splitlines())
    assert lines == [
        "2\tB\tupdate_postimage",
        "2\tb\tupdate_preimage",
        "3\tc\tinsert",
    ]


def test_cli_sql_over_warehouse(spark, warehouse, capsys):
    from pyspark.sql import types as T

    cat = Catalog(warehouse)
    cat.create_table(
        "default.nums", HiveTableSchema((("n", T.LongType()),))
    )
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec

    HiveOutput(spark, cat).write_table(
        WriteSpec("default.nums"),
        spark.createDataFrame([(i,) for i in range(10)], "n long"),
    )
    rc = main(["sql", "--warehouse", warehouse,
               "--query", "SELECT SUM(n) AS s, COUNT(*) AS c FROM nums"],
              stop_session=False)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out == ["s\tc", "45\t10"]


def test_cli_fsck_and_check(spark, warehouse, tmp_path, capsys):
    import json
    import os
    import shutil

    from pyspark.sql import types as T

    from hive_io_experimental_spark.output import HiveOutput, WriteSpec

    cat = Catalog(warehouse)
    cat.create_table(
        "default.ops_t",
        HiveTableSchema((("id", T.LongType()),), partition_keys=("p",)),
    )
    HiveOutput(spark, cat).write_table(
        WriteSpec("default.ops_t", {"p": "a"}),
        spark.createDataFrame([(1,), (1,)], "id long"),
    )

    assert main(["fsck", "--warehouse", warehouse]) == 0
    capsys.readouterr()
    shutil.rmtree(os.path.join(cat.table_location("default.ops_t"), "p=a"))
    assert main(["fsck", "--warehouse", warehouse]) == 1
    out = capsys.readouterr().out
    assert "missing_partition_dirs" in out and "ops_t" in out

    rules = tmp_path / "rules.json"
    rules.write_text(json.dumps([{"type": "unique", "column": "id"},
                                 {"type": "not_null", "column": "id"}]))
    # raw-path mode over a parquet file with a duplicate id -> exit 1
    src = str(tmp_path / "dup.parquet")
    spark.createDataFrame([(1,), (1,)], "id long").write.parquet(src)
    rc = main(["check", "--table", src, "--rules", str(rules)],
              stop_session=False)
    assert rc == 1
    out = capsys.readouterr().out
    assert "FAIL id\tunique\t1" in out and "ok   id\tnot_null\t0" in out


def test_cli_dedup_and_decontaminate(spark, tmp_path, capsys):
    batch = tmp_path / "batch"
    corpus = tmp_path / "corpus"
    spark.createDataFrame(
        [
            (10, "seen text one"),
            (11, "fresh document a"),
            (12, "fresh document a"),
        ],
        "doc_id long, text string",
    ).write.parquet(str(batch))
    spark.createDataFrame(
        [(1, "seen text one"), (2, "other corpus text")],
        "doc_id long, text string",
    ).write.parquet(str(corpus))

    rc = main(
        ["dedup", "--table", str(batch), "--against", str(corpus)],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == ["id", "fp"]
    assert [l.split("\t")[0] for l in out[1:]] == ["11"]

    # decontaminate: batch doc 10 reproduces corpus doc 1 verbatim -> flag,
    # exit 1 (gate semantics)
    rc = main(
        ["decontaminate", "--table", str(batch), "--benchmark", str(corpus)],
        stop_session=False,
    )
    assert rc == 1
    out = capsys.readouterr().out.strip().splitlines()
    flagged = {l.split("\t")[0] for l in out[1:]}
    assert "10" in flagged and "11" not in flagged

    # exact mode (no --against): groups with counts
    rc = main(["dedup", "--table", str(batch)], stop_session=False)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == ["text_hash", "kept_id", "dup_count"]
    counts = {l.split("\t")[1]: l.split("\t")[2] for l in out[1:]}
    assert counts["11"] == "2" and counts["10"] == "1"


def test_cli_spans_stats_and_strip(spark, tmp_path, capsys):
    t = tmp_path / "docs"
    spark.createDataFrame(
        [
            (0, "aaa bbb ccc ddd eee fff", "web"),
            (1, "xxx yyy aaa bbb ccc ddd zzz", "web"),
            (2, "unrelated tokens entirely different content here", "books"),
        ],
        "doc_id long, text string, source string",
    ).write.parquet(str(t))

    rc = main(
        ["spans", "--table", str(t), "--mode", "stats", "--window", "4"],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == [
        "source", "n_docs", "dup_docs", "total_tokens", "dup_tokens",
    ]
    rows = {l.split("\t")[0]: l.split("\t") for l in out[1:]}
    assert rows["web"][4] == "8" and rows["books"][4] == "0"

    rc = main(
        ["spans", "--table", str(t), "--mode", "strip", "--window", "4"],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    by_id = {l.split("\t")[0]: l.split("\t") for l in out[1:]}
    assert by_id["0"][1] == "eee fff"


def test_cli_search_index_and_query(spark, tmp_path, capsys):
    t = tmp_path / "docs_search"
    spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha"),
            (2, "beta gamma"),
            (3, "alpha delta"),
        ],
        "doc_id long, text string",
    ).write.parquet(str(t))

    # index mode: term -> df, tf_total, postings
    rc = main(["search", "--table", str(t)], stop_session=False)
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == ["term", "df", "tf_total", "postings"]
    rows = {l.split("\t")[0]: l.split("\t") for l in out[1:]}
    assert rows["alpha"][1:] == ["2", "3", "1,3"]

    # query mode: AND of alpha,beta -> only doc 1
    rc = main(
        ["search", "--table", str(t), "--terms", "alpha,beta"],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == ["doc_id", "tf_total"]
    assert [l.split("\t") for l in out[1:]] == [["1", "3"]]


def test_cli_erase_by_key(spark, warehouse, capsys):
    from pyspark.sql import types as T

    cat = Catalog(warehouse)
    cat.create_table(
        "default.kv_erase",
        HiveTableSchema(
            (("k", T.LongType()), ("v", T.StringType())),
            partition_keys=("p",),
        ),
    )
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec

    HiveOutput(spark, cat).write_table(
        WriteSpec("default.kv_erase", {"p": "a"}),
        spark.createDataFrame(
            [(1, "x"), (2, "y"), (3, "z")], "k long, v string"
        ),
    )
    rc = main(
        [
            "erase", "--table", "default.kv_erase",
            "--key-col", "k", "--values", "1,3",
            "--partition-col", "p", "--warehouse", warehouse,
        ],
        stop_session=False,
    )
    assert rc == 0
    assert "erased 2 rows across 1 partitions" in capsys.readouterr().out
    from hive_io_experimental_spark.input import HiveInput, ScanSpec

    left = {
        r.k
        for r in HiveInput(spark, cat)
        .read_table(ScanSpec(table="default.kv_erase"))
        .collect()
    }
    assert left == {2}


def test_cli_analyze_blooms_stamps_index(spark, warehouse, capsys):
    from pyspark.sql import types as T

    cat = Catalog(warehouse)
    cat.create_table(
        "default.bx_cli",
        HiveTableSchema(
            (("id", T.LongType()), ("v", T.StringType())),
            partition_keys=("p",),
        ),
    )
    from hive_io_experimental_spark.output import HiveOutput

    HiveOutput(spark, cat).write_dynamic(
        "default.bx_cli",
        spark.createDataFrame(
            [(1, "x", "a"), (2, "y", "b")], "id long, v string, p string"
        ),
    )
    rc = main(
        ["analyze", "--table", "default.bx_cli", "--blooms", "id",
         "--warehouse", warehouse],
        stop_session=False,
    )
    assert rc == 0
    parts = Catalog(warehouse).list_partitions("default.bx_cli")
    assert all(p.blooms.get("id", {}).get("words") for p in parts)


def test_cli_erase_types_keys_from_table_schema(spark, warehouse, capsys):
    """String key columns compare as strings: erasing '0123' must not
    touch the distinct key '123' (the all-digits value would coerce to
    int 123 if the CLI guessed types from the literal)."""
    from pyspark.sql import types as T

    cat = Catalog(warehouse)
    cat.create_table(
        "default.kv_str",
        HiveTableSchema(
            (("k", T.StringType()), ("v", T.StringType())),
            partition_keys=("p",),
        ),
    )
    from hive_io_experimental_spark.output import HiveOutput, WriteSpec

    HiveOutput(spark, cat).write_table(
        WriteSpec("default.kv_str", {"p": "a"}),
        spark.createDataFrame(
            [("0123", "x"), ("123", "y")], "k string, v string"
        ),
    )
    rc = main(
        [
            "erase", "--table", "default.kv_str",
            "--key-col", "k", "--values", "0123",
            "--partition-col", "p", "--warehouse", warehouse,
        ],
        stop_session=False,
    )
    assert rc == 0
    assert "erased 1 rows across 1 partitions" in capsys.readouterr().out
    from hive_io_experimental_spark.input import HiveInput, ScanSpec

    left = {
        r.k
        for r in HiveInput(spark, cat)
        .read_table(ScanSpec(table="default.kv_str"))
        .collect()
    }
    assert left == {"123"}


def test_cli_index_lifecycle(spark, tmp_path, capsys):
    """CLI build -> append -> query -> check over the persisted LSH
    index: build on half the vectors, append the rest, serve a top-k,
    and prove served == direct (n_mismatch 0)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    half_a = tmp_path / "half_a"
    half_b = tmp_path / "half_b"
    queries = tmp_path / "queries"
    emb.filter("vec_id % 2 = 0").write.parquet(str(half_a))
    emb.filter("vec_id % 2 = 1").write.parquet(str(half_b))
    emb.filter("vec_id < 10").write.parquet(str(queries))
    allv = tmp_path / "all"
    emb.write.parquet(str(allv))
    wh = str(tmp_path / "wh")
    os.makedirs(wh, exist_ok=True)

    rc = main(
        ["index", "build", "--table", str(half_a), "--index",
         "default.emb_lsh", "--planes", "8", "--warehouse", wh],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == [
        "num_planes", "dim", "n_vectors", "build_id",
    ]
    assert out[1].split("\t")[0] == "8"

    rc = main(
        ["index", "append", "--table", str(half_b), "--index",
         "default.emb_lsh", "--warehouse", wh],
        stop_session=False,
    )
    assert rc == 0
    capsys.readouterr()

    rc = main(
        ["index", "query", "--table", str(allv), "--queries", str(queries),
         "--index", "default.emb_lsh", "--k", "3", "--warehouse", wh],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == ["query_id", "neighbor_id", "cosine", "rank"]
    assert len(out) > 1

    rc = main(
        ["index", "check", "--table", str(allv), "--queries", str(queries),
         "--index", "default.emb_lsh", "--k", "3", "--warehouse", wh],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == ["n_queries", "n_served", "n_mismatch"]
    n_q, _n_served, n_mism = out[1].split("\t")
    assert n_q == "10" and n_mism == "0"


def test_cli_index_lifecycle_pq_and_ivfpq_tiers(spark, tmp_path, capsys):
    """--tier pq / ivfpq: build on the even half at stride 5, append the
    odd half under the stored geometry, then check against the direct
    operator at the equivalent full-corpus stride 10 — n_mismatch 0 end
    to end from the CLI (the similarity_*_append gates' proof, driven
    through the user surface)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    half_a = tmp_path / "half_a"
    half_b = tmp_path / "half_b"
    queries = tmp_path / "queries"
    emb.filter("vec_id % 2 = 0").write.parquet(str(half_a))
    emb.filter("vec_id % 2 = 1").write.parquet(str(half_b))
    emb.filter("vec_id < 10").write.parquet(str(queries))
    allv = tmp_path / "all"
    emb.write.parquet(str(allv))
    wh = str(tmp_path / "wh")
    os.makedirs(wh, exist_ok=True)

    for tier, idx in (("pq", "default.emb_pq"), ("ivfpq", "default.emb_ip")):
        rc = main(
            ["index", "build", "--tier", tier, "--table", str(half_a),
             "--index", idx, "--stride", "5", "--pq-stride", "5",
             "--max-codes", "128", "--warehouse", wh],
            stop_session=False,
        )
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert out[0].split("\t") == [
            "index", "tier", "n_codes", "n_codebook_rows",
        ]
        rc = main(
            ["index", "append", "--tier", tier, "--table", str(half_b),
             "--index", idx, "--warehouse", wh],
            stop_session=False,
        )
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert int(out[1].split("\t")[2]) == emb.count()  # n_codes
        rc = main(
            ["index", "query", "--tier", tier, "--table", str(allv),
             "--queries", str(queries), "--index", idx, "--k", "3",
             "--warehouse", wh],
            stop_session=False,
        )
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert out[0].split("\t") == [
            "query_id", "neighbor_id", "adc_score", "rank",
        ]
        assert len(out) > 1
        rc = main(
            ["index", "check", "--tier", tier, "--table", str(allv),
             "--queries", str(queries), "--index", idx, "--k", "3",
             "--stride", "10", "--pq-stride", "10", "--max-codes", "128",
             "--warehouse", wh],
            stop_session=False,
        )
        assert rc == 0
        out = capsys.readouterr().out.strip().splitlines()
        assert out[0].split("\t") == ["n_queries", "n_served", "n_mismatch"]
        n_q, _n_served, n_mism = out[1].split("\t")
        assert n_q == "10" and n_mism == "0", f"tier {tier}: {out[1]}"


def test_cli_dedup_semantic(spark, tmp_path, capsys):
    emb = tmp_path / "emb"
    spark.createDataFrame(
        [
            (0, [1.0, 0.0]),
            (1, [2.0, 0.0]),   # parallel to 0 -> dropped, kept by 0
            (2, [0.0, 1.0]),
        ],
        "vec_id long, embedding array<double>",
    ).write.parquet(str(emb))
    rc = main(
        ["dedup", "--table", str(emb), "--semantic", "--id-col", "vec_id",
         "--threshold", "0.9", "--centroid-stride", "2"],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == ["doc_id", "kept_id", "cosine"]
    assert [l.split("\t")[:2] for l in out[1:]] == [["1", "0"]]


def test_cli_search_bm25_and_hybrid(spark, tmp_path, capsys):
    t = tmp_path / "docs_h"
    spark.createDataFrame(
        [
            (0, "alpha beta gamma"),
            (1, "alpha alpha delta"),
            (2, "epsilon zeta eta"),
            (3, "beta beta beta"),
        ],
        "doc_id long, text string",
    ).write.parquet(str(t))
    e = tmp_path / "emb_h"
    spark.createDataFrame(
        [
            (0, [0.0, 1.0]),
            (1, [1.0, 0.0]),
            (2, [0.9, 0.4]),
            (3, [-1.0, 0.0]),
        ],
        "vec_id long, embedding array<float>",
    ).write.parquet(str(e))

    # BM25 (OR) ranking: doc 1 (tf=2) outranks doc 0 (tf=1) for 'alpha'
    rc = main(
        ["search", "--table", str(t), "--terms", "alpha",
         "--ranker", "bm25"],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == ["doc_id", "n_terms_hit", "score"]
    assert [l.split("\t")[0] for l in out[1:]] == ["1", "0"]

    # hybrid: doc 1 tops both legs (tf=2 lexical; cosine 1.0 vs vec 1)
    rc = main(
        ["search", "--table", str(t), "--terms", "alpha",
         "--embeddings", str(e), "--query-vec-id", "1",
         "--top-k", "4"],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == [
        "doc_id", "lex_rank", "sem_rank", "cosine", "rrf_score"
    ]
    assert out[1].split("\t")[0] == "1"  # fused winner

    # --embeddings without --terms is a usage error
    rc = main(
        ["search", "--table", str(t), "--embeddings", str(e)],
        stop_session=False,
    )
    assert rc == 2

    # missing query vector id is a clean error, not a crash
    rc = main(
        ["search", "--table", str(t), "--terms", "alpha",
         "--embeddings", str(e), "--query-vec-id", "999"],
        stop_session=False,
    )
    assert rc == 2


def test_cli_search_prf(spark, tmp_path, capsys):
    t = tmp_path / "docs_prf"
    spark.createDataFrame(
        [
            (0, "join merge merge"),
            (1, "join merge qqq"),
            (2, "merge merge zzz"),
            (3, "alpha beta gamma"),
        ],
        "doc_id long, text string",
    ).write.parquet(str(t))
    # PRF expansion surfaces doc 2 (never says 'join') via 'merge'
    rc = main(
        ["search", "--table", str(t), "--terms", "join",
         "--ranker", "prf", "--fb-docs", "2", "--fb-terms", "2"],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == ["doc_id", "n_terms_hit", "score"]
    assert "2" in {l.split("\t")[0] for l in out[1:]}


def test_cli_tokenize_lifecycle(spark, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    t = tmp_path / "docs_tk"
    spark.createDataFrame(
        [(0, "the cat and the hat"), (1, "the bat and a cat"),
         (2, "that cat sat")],
        "doc_id long, text string",
    ).write.parquet(str(t))

    rc = main(
        ["tokenize", "train", "--table", str(t), "--vocab",
         "default.cli_bpe", "--num-merges", "5", "--warehouse", wh],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == [
        "num_merges", "n_merges", "max_vocab", "build_id"
    ]
    assert out[1].split("\t")[:2] == ["5", "5"]

    rc = main(
        ["tokenize", "apply", "--table", str(t), "--vocab",
         "default.cli_bpe", "--warehouse", wh],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == ["doc_id", "n_words", "n_bpe_tokens"]
    assert len(out) == 4  # header + 3 docs

    rc = main(
        ["tokenize", "check", "--table", str(t), "--vocab",
         "default.cli_bpe", "--warehouse", wh],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == [
        "n_merges", "n_docs", "n_merge_mismatch", "n_segment_mismatch"
    ]
    assert out[1].split("\t") == ["5", "3", "0", "0"]


def test_cli_classify_lifecycle(spark, tmp_path, capsys):
    wh = str(tmp_path / "wh")
    t = tmp_path / "docs_cf"
    spark.createDataFrame(
        [
            (0, "apfel birne kirsche", "de"),
            (1, "birne apfel apfel", "de"),
            (2, "apple pear cherry", "en"),
            (3, "pear apple apple", "en"),
        ],
        "doc_id long, text string, lang string",
    ).write.parquet(str(t))

    rc = main(
        ["classify", "train", "--table", str(t), "--model",
         "default.cli_nb", "--warehouse", wh],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == [
        "n_labels", "n_model_rows", "n_docs_total", "vocab_size",
        "last_update_fp", "build_id",
    ]
    assert out[1].split("\t")[0] == "2"
    assert out[1].split("\t")[2] == "4"

    rc = main(
        ["classify", "score", "--table", str(t), "--model",
         "default.cli_nb", "--warehouse", wh],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == ["doc_id", "label", "total_bits",
                                  "n_tokens"]
    labels = {l.split("\t")[0]: l.split("\t")[1] for l in out[1:]}
    assert labels["0"] == "de" and labels["2"] == "en"

    # fold a new labeled batch in (the nightly-delta verb): meta moves
    # to the merged counts and a new label appears for scoring
    t2 = tmp_path / "docs_cf2"
    spark.createDataFrame(
        [(4, "pomme poire", "fr"), (5, "apfel pear", "de")],
        "doc_id long, text string, lang string",
    ).write.parquet(str(t2))
    rc = main(
        ["classify", "update", "--table", str(t2), "--model",
         "default.cli_nb", "--warehouse", wh],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[1].split("\t")[0] == "3"  # fr joined
    assert out[1].split("\t")[2] == "6"  # n_docs_total merged

    # stored-vs-retrain proof AGAINST THE UNION corpus: the exact-fold
    # contract means the updated model equals a full retrain on t ∪ t2
    t_all = tmp_path / "docs_cf_all"
    spark.read.parquet(str(t)).unionAll(
        spark.read.parquet(str(t2))
    ).write.parquet(str(t_all))
    rc = main(
        ["classify", "check", "--table", str(t_all), "--model",
         "default.cli_nb", "--warehouse", wh],
        stop_session=False,
    )
    assert rc == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[1].split("\t")[2:] == ["0", "0", "0"]


def test_cli_index_repair_torn_append(spark, tmp_path, capsys):
    """`index repair --tier ivfpq`: detect a torn two-table append
    (--detect-only) and complete it from the corpus — the batch-free
    maintenance verb, driven through the user surface. Other tiers are
    refused (their appends move one table and cannot tear)."""
    from hive_io_experimental_spark.catalog import Catalog

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    half_a = tmp_path / "half_a"
    half_b = tmp_path / "half_b"
    allv = tmp_path / "all"
    queries = tmp_path / "queries"
    emb.filter("vec_id % 2 = 0").write.parquet(str(half_a))
    emb.filter("vec_id % 2 = 1").write.parquet(str(half_b))
    emb.write.parquet(str(allv))
    emb.filter("vec_id < 10").write.parquet(str(queries))
    wh = str(tmp_path / "wh")
    os.makedirs(wh, exist_ok=True)
    idx = "default.emb_ipr"
    assert main(
        ["index", "build", "--tier", "ivfpq", "--table", str(half_a),
         "--index", idx, "--stride", "5", "--pq-stride", "5",
         "--max-codes", "128", "--warehouse", wh],
        stop_session=False,
    ) == 0
    cat = Catalog(wh)
    v_built = cat.current_version(idx)
    assert main(
        ["index", "append", "--tier", "ivfpq", "--table", str(half_b),
         "--index", idx, "--warehouse", wh],
        stop_session=False,
    ) == 0
    capsys.readouterr()
    # tear: codes table back to its pre-append snapshot
    cat.rollback_to_version(idx, v_built)
    n_torn = emb.filter("vec_id % 2 = 1").count()

    assert main(
        ["index", "repair", "--tier", "ivfpq", "--table", str(allv),
         "--index", idx, "--detect-only", "--warehouse", wh],
        stop_session=False,
    ) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[0].split("\t") == [
        "n_missing_codes", "n_missing_lists",
        "n_repaired_codes", "n_repaired_lists",
    ]
    assert out[1].split("\t") == [str(n_torn), "0", "0", "0"]

    assert main(
        ["index", "repair", "--tier", "ivfpq", "--table", str(allv),
         "--index", idx, "--warehouse", wh],
        stop_session=False,
    ) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[1].split("\t") == [str(n_torn), "0", str(n_torn), "0"]
    # post-repair: serving equals the direct operator over the corpus
    assert main(
        ["index", "check", "--tier", "ivfpq", "--table", str(allv),
         "--queries", str(queries), "--index", idx, "--k", "3",
         "--stride", "10", "--pq-stride", "10", "--max-codes", "128",
         "--warehouse", wh],
        stop_session=False,
    ) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[1].split("\t")[2] == "0"

    with pytest.raises(SystemExit, match="ivfpq only"):
        main(
            ["index", "repair", "--tier", "pq", "--table", str(allv),
             "--index", idx, "--warehouse", wh],
            stop_session=False,
        )

    # detection needs no corpus at all — the corpus-erasure case the
    # verb exists for must not die resolving --table (r14 self-review)
    assert main(
        ["index", "repair", "--tier", "ivfpq", "--index", idx,
         "--detect-only", "--warehouse", wh],
        stop_session=False,
    ) == 0
    out = capsys.readouterr().out.strip().splitlines()
    assert out[1].split("\t") == ["0", "0", "0", "0"]
    # every other action still requires the corpus
    with pytest.raises(SystemExit, match="requires --table"):
        main(
            ["index", "repair", "--tier", "ivfpq", "--index", idx,
             "--warehouse", wh],
            stop_session=False,
        )
