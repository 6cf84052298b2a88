"""Table-layout scan-locality audit: does the page store's file layout
co-locate the rows host-scoped queries read?

Every recurring crawl read is host- or domain-scoped — politeness
windows, robots refresh, revalidation probes, per-host reputation,
sitemap coverage. If pages are written in CRAWL order (discovery
interleaves hosts), one host's rows smear across every file and a
host-scoped query touches the whole table; clustering the write by SURT
(the Heritrix/CDX sort key: reversed host labels first) makes each host
a contiguous run, so partition pruning + min/max file statistics (the
Iceberg/parquet footer machinery) skip everything else.

This module MEASURES that: assign rows to files under a candidate
ordering, then report files-touched-per-host and hosts-per-file — the
two numbers that decide whether a host-scoped scan is O(host) or
O(table).

Reference analog: the reference keeps per-host request accounting in
process memory (tree.ts rate limiting); at 10^10 URLs that state lives
in the table layout, which is why the audit exists.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from . import join_scalar_frame
from ..warc import col_surt


def file_assignment(
    pages: DataFrame,
    rows_per_file: int,
    order_exprs: list[Column],
    exact: bool = True,
) -> DataFrame:
    """Tag every row with the file id a writer using ``order_exprs`` would
    put it in.

    ``exact=True`` reproduces the writer bit-for-bit — global row_number
    over the ordering, file = (rn−1) // rows_per_file. That window is a
    single-task sort: the ORACLE/test path, correct at any size that fits
    one task, NOT the 100 TB path.

    ``exact=False`` is the scale path: ``repartitionByRange`` over the
    same ordering (sampled range boundaries — exactly what a sorted
    Iceberg/parquet write does physically), file = partition id. File
    boundaries differ from the exact path by sampling, but locality
    STATISTICS are equivalent — which is what the audit consumes."""
    if exact:
        w = Window.orderBy(*order_exprs)
        return pages.withColumn(
            "_fid",
            ((F.row_number().over(w) - 1) / F.lit(rows_per_file)).cast("int"),
        )
    n = pages.count()
    n_files = max(1, -(-n // rows_per_file))
    return pages.repartitionByRange(n_files, *order_exprs).withColumn(
        "_fid", F.spark_partition_id()
    )


def scan_locality_stats(
    assigned: DataFrame, layout_name: str, host_col: str = "host"
) -> DataFrame:
    """One summary row for a file-assigned frame: (layout, n_files,
    avg/max hosts per file, avg/max files per host). Two partial-agg
    groupBys (file-keyed and host-keyed), their 1-row aggregates combined
    via join_scalar_frame (a BroadcastHashJoin, not a nested loop) — no
    windows, no global sort; shuffles ∝ #files + #hosts."""
    pf = assigned.groupBy("_fid").agg(F.countDistinct(host_col).alias("h"))
    ph = assigned.groupBy(host_col).agg(F.countDistinct("_fid").alias("f"))
    a = pf.agg(
        F.count(F.lit(1)).cast("int").alias("n_files"),
        F.round(F.avg("h"), 4).alias("avg_hosts_per_file_r"),
        F.max("h").cast("int").alias("max_hosts_per_file"),
    )
    b = ph.agg(
        F.round(F.avg("f"), 4).alias("avg_files_per_host_r"),
        F.max("f").cast("int").alias("max_files_per_host"),
    )
    return join_scalar_frame(a, b).select(
        F.lit(layout_name).alias("layout"),
        "n_files",
        "avg_hosts_per_file_r",
        "max_hosts_per_file",
        "avg_files_per_host_r",
        "max_files_per_host",
    )


def col_zorder_key(a: Column, b: Column, bits: int = 16) -> Column:
    """Morton/Z-order interleave of the low ``bits`` bits of two
    non-negative dimension values (a's bit i lands at position 2i+1, b's
    at 2i) — the space-filling-curve sort key lakehouse writers use so a
    2-D range scan (host × time, the crawl ledger's natural query box)
    touches O(√files) instead of all of one dimension's stripes. Pure
    codegen bit arithmetic; the disjoint bit positions mean the OR is a
    SUM, which is how the DuckDB oracle restates it."""
    if not (1 <= bits <= 31):
        raise ValueError("bits must be in [1, 31]")
    acc = F.lit(0).cast("long")
    for i in range(bits):
        acc = (
            acc
            + F.shiftleft(F.shiftright(a.cast("long"), i) % 2, 2 * i + 1)
            + F.shiftleft(F.shiftright(b.cast("long"), i) % 2, 2 * i)
        )
    return acc


def zorder_locality_audit(
    df: DataFrame,
    a_col: str,
    b_col: str,
    rows_per_file: int,
    box_a: tuple[int, int],
    box_b: tuple[int, int],
    bits: int = 16,
    exact: bool = True,
) -> DataFrame:
    """Three candidate layouts for the same table — sort by (a, b), sort
    by (b, a), Z-order — audited against one rectangular query box:
    which layout lets a reader skip the most files? Output per layout:
    (layout, n_files, files_touched, files_touched_frac_r). Single-key
    sorts ace their own dimension and degrade to full scans on the
    other; Z-order pays a little on both to win on the BOX — the number
    this audit puts in front of the layout decision.

    Same machinery as ``layout_compare``: exact writer simulation for
    oracle parity, ``repartitionByRange`` at scale. Census is two
    partial aggs per layout (files total, files containing box rows)."""
    a, b = F.col(a_col), F.col(b_col)
    layouts = {
        "a_then_b": [a, b],
        "b_then_a": [b, a],
        "zorder": [col_zorder_key(a, b, bits)],
    }
    out = None
    in_box = (
        (a >= box_a[0]) & (a <= box_a[1]) & (b >= box_b[0]) & (b <= box_b[1])
    )
    for name, order in layouts.items():
        assigned = file_assignment(df, rows_per_file, order + [a, b], exact=exact)
        stats = assigned.agg(
            F.countDistinct("_fid").cast("int").alias("n_files"),
            F.countDistinct(F.when(in_box, F.col("_fid")))
            .cast("int")
            .alias("files_touched"),
        ).select(
            F.lit(name).alias("layout"),
            "n_files",
            "files_touched",
            F.round(
                F.col("files_touched")
                / F.when(F.col("n_files") > 0, F.col("n_files")),
                6,
            ).alias("files_touched_frac_r"),
        )
        out = stats if out is None else out.unionByName(stats)
    return out


def rendezvous_assign(
    df: DataFrame,
    shards: list[str],
    key_col: str = "doc_id",
    out_col: str = "shard",
) -> DataFrame:
    """Rendezvous / highest-random-weight shard routing (Thaler &
    Ravishankar 1998): key → argmax over shards of h(key, shard). The
    property that matters for a living index/frontier: ADDING a shard
    moves only the keys that now win on the new shard (~1/(n+1) of
    them), and every moved key moves TO the new shard — no global
    reshuffle, unlike mod-N routing where nearly all keys move. h is the
    repo's engine-portable md5 bucket hash so a DuckDB oracle restates
    the assignment bit-for-bit.

    Pure map-only projection (one md5 per shard per row, all codegen);
    ties (≈2⁻³² per pair) break toward the lexicographically LARGEST
    shard id, deterministically. Shard list is a literal — the routing
    table, driver-held by definition."""
    if not shards:
        raise ValueError("rendezvous_assign needs at least one shard")
    if len(set(shards)) != len(shards):
        raise ValueError("duplicate shard ids")
    key = F.col(key_col).cast("string")
    scored = F.array(
        *[
            F.struct(
                F.conv(
                    F.substring(F.md5(F.concat(key, F.lit(f":{s}"))), 1, 8),
                    16,
                    10,
                )
                .cast("long")
                .alias("h"),
                F.lit(s).alias("s"),
            )
            for s in shards
        ]
    )
    return df.withColumn(out_col, F.array_max(scored).getField("s"))


def layout_compare(
    pages: DataFrame,
    rows_per_file: int,
    url_col: str = "url",
    host_col: str = "host",
    seq_col: str = "seq",
    exact: bool = True,
) -> DataFrame:
    """Two rows — ``insertion`` (crawl/seq order, the naive write) vs
    ``surt`` (SURT-clustered, the locality write) — with the same
    locality stats, so the layout decision is a number, not folklore.
    A healthy SURT layout shows avg_files_per_host ≈ host_rows /
    rows_per_file + 1 and hosts_per_file collapsing toward
    rows_per_file / host_rows."""
    surt = pages.withColumn("_surt", col_surt(url_col))
    by_surt = file_assignment(
        surt, rows_per_file, [F.col("_surt"), F.col(seq_col)], exact=exact
    )
    by_seq = file_assignment(pages, rows_per_file, [F.col(seq_col)], exact=exact)
    return scan_locality_stats(by_surt, "surt", host_col).unionByName(
        scan_locality_stats(by_seq, "insertion", host_col)
    )


def reshard_move_stats(
    df: DataFrame,
    shards_before: list[str],
    shards_after: list[str],
    key_col: str = "doc_id",
) -> DataFrame:
    """Quantify the reshard: what fraction of keys MOVE when the shard
    set grows from ``shards_before`` to ``shards_after``, under (a)
    mod-N routing (bucket % n — the naive scheme) and (b) rendezvous/HRW
    routing (`rendezvous_assign`). One row:

      (n_keys, mod_moved_r, hrw_moved_r, hrw_moved_to_new_r)

    The consistent-hashing claim, MEASURED instead of asserted: mod-N
    moves ≈ 1 − 1/lcm-ish ≈ nearly everything (n→n+1 relocates ~n/(n+1)
    of all keys — a full frontier/index reshuffle), HRW moves ≈ the new
    shards' fair share, and every HRW-moved key lands ON a new shard
    (hrw_moved_to_new_r = 1.0 whenever shards only grew — pinned in
    tests). Pure map-only projection (two mod buckets from the
    engine-portable md5 hash + two HRW argmaxes) + ONE 1-row aggregate;
    oracle-replayable bit-for-bit."""
    if not shards_before or not shards_after:
        raise ValueError("shard lists must be non-empty")
    from .curation import col_hash_bucket

    keyed = df.select(F.col(key_col).alias("k"))
    keyed = rendezvous_assign(keyed, shards_before, key_col="k", out_col="_hrw_b")
    keyed = rendezvous_assign(keyed, shards_after, key_col="k", out_col="_hrw_a")
    # mod routing from the same portable hash family: bucket % n
    h = col_hash_bucket(F.col("k"), 1_000_003)
    keyed = keyed.withColumn(
        "_mod_b", F.pmod(h, F.lit(len(shards_before)))
    ).withColumn("_mod_a", F.pmod(h, F.lit(len(shards_after))))
    new_shards = [s for s in shards_after if s not in set(shards_before)]
    hrw_moved = F.col("_hrw_b") != F.col("_hrw_a")
    return keyed.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.round(
            F.avg((F.col("_mod_b") != F.col("_mod_a")).cast("double")), 6
        ).alias("mod_moved_r"),
        F.round(F.avg(hrw_moved.cast("double")), 6).alias("hrw_moved_r"),
        F.round(
            F.when(
                F.sum(hrw_moved.cast("long")) > 0,
                F.sum(
                    (hrw_moved & F.col("_hrw_a").isin(new_shards or [""]))
                    .cast("long")
                )
                / F.sum(hrw_moved.cast("long")),
            ),
            6,
        ).alias("hrw_moved_to_new_r"),
    )
