"""Semantics pins for the adapted TPC-H query shapes (relational.py).

The driver's oracle gate checks engine parity; these tests pin the
row-level SEMANTICS on hand-built inputs where the interesting edge is
easy to see: Q21's only-late-supplier logic, Q2's tie retention, Q15's
max-tie retention, and Q11's scalar-subquery threshold.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from hive_io_experimental_spark.operators import relational


def _ts(day: int):
    return dt.datetime(1995, 1, day)


def test_waiting_orders_only_sole_late_supplier_counts(spark):
    # order 1: supplier 10 late, supplier 20 on time  -> 10 counts
    # order 2: suppliers 10 and 20 BOTH late          -> nobody counts
    # order 3: supplier 10 late but single-supplier   -> no other supplier,
    #          fails the EXISTS arm
    orders = spark.createDataFrame(
        [(1, _ts(1)), (2, _ts(1)), (3, _ts(1))],
        "o_orderkey long, o_orderdate timestamp_ntz",
    )
    late, ontime = _ts(1) + dt.timedelta(days=90), _ts(1) + dt.timedelta(days=5)
    lineitem = spark.createDataFrame(
        [
            (1, 10, late), (1, 20, ontime),
            (2, 10, late), (2, 20, late),
            (3, 10, late),
        ],
        "l_orderkey long, l_suppkey long, l_shipdate timestamp_ntz",
    )
    supplier = spark.createDataFrame(
        [(10, "Supp#10", 0), (20, "Supp#20", 0)],
        "s_suppkey long, s_name string, s_nationkey long",
    )
    rows = relational.waiting_orders(supplier, orders, lineitem).collect()
    assert [(r.s_name, r.numwait) for r in rows] == [("Supp#10", 1)]


def test_min_cost_supplier_keeps_all_ties(spark):
    # part 1: suppliers 10 and 20 both offer 5.00 (tie -> both rows);
    # part 2: supplier 20 at 3.00 beats supplier 10 at 4.00.
    lineitem = spark.createDataFrame(
        [
            (1, 10, 5.00), (1, 20, 5.00), (1, 20, 9.00),
            (2, 10, 4.00), (2, 20, 3.00),
        ],
        "l_partkey long, l_suppkey long, l_extendedprice double",
    )
    part = spark.createDataFrame(
        [(1, "p one"), (2, "p two")], "p_partkey long, p_name string"
    )
    supplier = spark.createDataFrame(
        [(10, "Supp#10", 100.0, 0), (20, "Supp#20", 200.0, 0)],
        "s_suppkey long, s_name string, s_acctbal double, s_nationkey long",
    )
    nation = spark.createDataFrame(
        [(0, "NATION0", 0)], "n_nationkey long, n_name string, n_regionkey long"
    )
    rows = relational.min_cost_supplier(part, supplier, nation, lineitem).collect()
    got = {(r.p_partkey, r.s_suppkey): r.offer for r in rows}
    assert got == {(1, 10): 5.0, (1, 20): 5.0, (2, 20): 3.0}


def test_top_supplier_keeps_max_ties(spark):
    lineitem = spark.createDataFrame(
        [(10, 7.0, 0.0), (20, 7.0, 0.0), (30, 1.0, 0.0)],
        "l_suppkey long, l_extendedprice double, l_discount double",
    )
    supplier = spark.createDataFrame(
        [(10, "A"), (20, "B"), (30, "C")], "s_suppkey long, s_name string"
    )
    rows = relational.top_supplier(supplier, lineitem).collect()
    assert [(r.s_suppkey, r.total_revenue) for r in rows] == [(10, 7.0), (20, 7.0)]


def test_important_parts_threshold_is_global_fraction(spark):
    # total 100.00; fraction 0.3 -> threshold 30.0: only part 1 (60) passes,
    # part 2 (40 > 30) passes too, part 3 (0) absent... pick values so the
    # boundary case (== threshold) is excluded: strict >.
    lineitem = spark.createDataFrame(
        [(1, 60.0), (2, 30.0), (3, 10.0)],
        "l_partkey long, l_extendedprice double",
    )
    rows = relational.important_parts(lineitem, fraction=0.3).collect()
    assert [(r.l_partkey, r.part_value) for r in rows] == [(1, 60.0)]


def test_ship_latency_priority_bucket_boundaries(spark):
    orders = spark.createDataFrame(
        [(1, _ts(1), "1-URGENT"), (2, _ts(1), "5-LOW")],
        "o_orderkey long, o_orderdate timestamp_ntz, o_orderpriority string",
    )
    d = dt.timedelta
    lineitem = spark.createDataFrame(
        [
            (1, _ts(1) + d(days=29)),   # fast  (< 30)
            (1, _ts(1) + d(days=30)),   # medium (boundary: not < 30)
            (2, _ts(1) + d(days=59)),   # medium
            (2, _ts(1) + d(days=60)),   # slow  (boundary: not < 60)
        ],
        "l_orderkey long, l_shipdate timestamp_ntz",
    )
    rows = relational.ship_latency_priority(orders, lineitem).collect()
    got = {r.latency_class: (r.high_line_count, r.low_line_count) for r in rows}
    assert got == {"fast": (1, 0), "medium": (1, 1), "slow": (0, 1)}
