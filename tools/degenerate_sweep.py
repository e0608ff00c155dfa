"""Degenerate-input divergence sweep: every registry query vs its DuckDB
oracle over EMPTY, SINGLE-ROW, EMPTY-FACT, and HOT-KEY table variants
(r16 verdict task 1; hotkey added per r17 verdict task 5).

The r16 fresh-seed fuzz campaign proved the class is real: Spark's
``GROUP BY CUBE`` returns zero rows over an empty input where ANSI/DuckDB
emit the ``()`` grand-total row (fixed in operators/relational.py). One bug
found by luck-of-the-seed means every aggregate/grouping-set/pivot/window
shape deserves a systematic pass with inputs that are (a) completely empty
and (b) a single row per table — the two slices where ANSI global-aggregate
semantics, empty-over-empty divisions, and NULL-propagating extrema diverge
most often between engines.

Variants are materialized by slicing the driver's own sf0.001 parquet with
pyarrow (``version="2.6"`` so TIMESTAMP(NANOS) columns round-trip exactly —
both engines then read byte-identical files, same as the driver's gate).

The ``hotkey`` variant keeps every row but rewrites ONE column per table
so a single value owns ~95% of the rows (events.user_id, documents.lang,
orders.o_custkey, …) — the extreme-skew shape that exercises hot-bucket
caps, per-key window sorts (sessionize/asof), and salting paths that
uniform fuzz draws almost never produce. Values are rewritten, not
sliced, which is fine for parity: BOTH engines read the same rewritten
parquet, so any divergence is an engine-semantics difference, exactly
what the sweep hunts.

The ``nullkey`` variant nulls the first half of the SAME per-table
columns instead — NULL is the ultimate hot key, and the classic
engine-divergence surface: Spark orders NULLS FIRST on ASC where DuckDB
defaults NULLS LAST (any top-k cut over a nulled column), null-unsafe
equi-joins silently drop labeled rows, and grouping treats NULL as one
key on both engines.

Usage::

    python tools/degenerate_sweep.py [--only name1,name2] \
        [--variant empty|onerow|emptyfact|hotkey|nullkey]

Exit 0 = no divergence; exit 2 = at least one divergence/error (report
on stdout either way). A FULL run (no --only/--variant) writes the
canonical DEGEN_SWEEP.json; PARTIAL runs write DEGEN_SWEEP.partial.json
so a spot-run can never clobber the canonical record (r17 verdict
task 4 — the judge's 4-query spot-run did exactly that). ``--out``
overrides either default explicitly.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import traceback

import duckdb
import pandas as pd
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_BASE = os.environ.get("DEGEN_SF_BASE", "/root/testdata/sf0.001")
TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)
#: Fact tables for the "emptyfact" variant: facts empty, dimensions
#: populated — the join-against-empty / emptied-slice shape (scalar
#: subqueries over live dims vs empty facts, HAVING over empty groups,
#: all-NULL left-join aggregates) that all-tables-empty can mask.
FACTS = {"orders", "lineitem", "events", "documents", "embeddings"}

#: hotkey variant: per-table column rewritten so its FIRST value owns
#: ~95% of rows. Grouping/join keys with real fan-out are chosen (the
#: null/default/bot-id shape at 100 TB); tiny dims are left alone.
HOT_COLS = {
    "events": "user_id",
    "documents": "lang",
    "orders": "o_custkey",
    "lineitem": "l_suppkey",
    "customer": "c_nationkey",
    "part": "p_brand",
    "supplier": "s_nationkey",
    "embeddings": "label",
    "nation": "n_regionkey",
}
HOT_FRACTION = 0.95


def build_variant(base: str, out_dir: str, rows: int, facts_only: bool = False) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        t = pq.read_table(f"{base}/{name}.parquet")
        n = rows if (not facts_only or name in FACTS) else len(t)
        pq.write_table(t.slice(0, n), f"{out_dir}/{name}.parquet", version="2.6")


#: nullkey variant: fraction of each HOT_COLS column nulled (the
#: missing-attribution shape — engines classically diverge on null
#: grouping/ordering/join semantics; Spark sorts NULLS FIRST asc where
#: DuckDB defaults NULLS LAST, inner equi-joins drop nulls on both, and
#: any null-unsafe join-back drops labeled rows).
NULL_FRACTION = 0.5


def build_hotkey_variant(base: str, out_dir: str, null_keys: bool = False) -> None:
    """All rows kept; HOT_COLS[table] rewritten (pure-arrow, so
    TIMESTAMP(NANOS) and every other type round-trip byte-identically
    for both engines). Default: the column's first value owns the first
    ``HOT_FRACTION`` of rows (hot-key skew). ``null_keys=True``: the
    first ``NULL_FRACTION`` of rows get NULL instead (the nullkey
    variant — NULL is itself the ultimate hot key)."""
    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)
    for name in TABLES:
        t = pq.read_table(f"{base}/{name}.parquet")
        col = HOT_COLS.get(name)
        if col and len(t):
            typ = t.schema.field(col).type
            arr = t.column(col).combine_chunks()
            if null_keys:
                k = int(len(t) * NULL_FRACTION)
                head = pa.nulls(k, typ)
            else:
                k = int(len(t) * HOT_FRACTION)
                head = pa.repeat(arr[0], k)
            new = pa.chunked_array([head, arr.slice(k)]).cast(typ)
            t = t.set_column(
                t.schema.get_field_index(col), t.schema.field(col), new
            )
        pq.write_table(t, f"{out_dir}/{name}.parquet", version="2.6")


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    if len(df):
        df = df.sort_values(list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def compare(a: pd.DataFrame, b: pd.DataFrame) -> str | None:
    """Return a divergence description, or None if equal (driver semantics:
    order-insensitive, name-matched columns, exact values)."""
    if sorted(a.columns) != sorted(b.columns):
        return f"schema: spark={sorted(a.columns)} oracle={sorted(b.columns)}"
    if len(a) != len(b):
        return f"rows: spark={len(a)} oracle={len(b)}"
    try:
        pd.testing.assert_frame_equal(
            norm(a), norm(b), check_dtype=False, check_exact=True
        )
    except AssertionError as e:
        return f"values: {str(e).splitlines()[-1][:300]}"
    return None


def resolve_out(only: str | None, variant: str | None, out: str | None) -> tuple[str, bool]:
    """(summary path, is_partial). Partial runs (--only/--variant) must
    NEVER default to the canonical DEGEN_SWEEP.json — a spot-run would
    clobber the full 536-entry record (r17 verdict task 4)."""
    partial = bool(only or variant)
    return (
        out or ("DEGEN_SWEEP.partial.json" if partial else "DEGEN_SWEEP.json"),
        partial,
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--only", default=None, help="comma-separated query names")
    ap.add_argument(
        "--variant",
        default=None,
        choices=["empty", "onerow", "emptyfact", "hotkey", "nullkey"],
    )
    ap.add_argument(
        "--out",
        default=None,
        help="summary path; defaults to DEGEN_SWEEP.json for a full run "
        "and DEGEN_SWEEP.partial.json when --only/--variant restricts it",
    )
    args = ap.parse_args()
    out_path, partial = resolve_out(args.only, args.variant, args.out)

    import __spark_entry__ as entrymod
    from flink_streaming_2_10_spark.session import get_spark

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()
    if args.only:
        keep = set(args.only.split(","))
        queries = {k: v for k, v in queries.items() if k in keep}

    variants = (
        ["empty", "onerow", "emptyfact", "hotkey", "nullkey"]
        if args.variant is None
        else [args.variant]
    )
    root = tempfile.mkdtemp(prefix="degen_")
    dirs = {}
    for v in variants:
        d = os.path.join(root, v)
        if v in ("hotkey", "nullkey"):
            build_hotkey_variant(SF_BASE, d, null_keys=(v == "nullkey"))
        else:
            build_variant(
                SF_BASE, d, 0 if v != "onerow" else 1,
                facts_only=(v == "emptyfact"),
            )
        dirs[v] = d

    spark = get_spark("degenerate-sweep", cpus=8, shuffle_partitions=8)
    results: dict[str, dict[str, dict]] = {}
    n_div = n_err = n_ok = n_rowsonly = 0

    for v in variants:
        con = duckdb.connect()
        for name in TABLES:
            con.sql(
                f"CREATE VIEW {name} AS SELECT * FROM '{dirs[v]}/{name}.parquet'"
            )
        for qname, fn in queries.items():
            rec: dict = {}
            try:
                a = fn(spark, dirs[v]).toPandas()
                rec["spark_rows"] = len(a)
            except Exception as e:
                rec["err"] = f"spark: {type(e).__name__}: {str(e)[:300]}"
                results.setdefault(qname, {})[v] = rec
                n_err += 1
                print(f"ERR  {v:6s} {qname}: {rec['err']}", flush=True)
                continue
            sql = oracles.get(qname)
            if sql is None:
                rec["status"] = "rows-only (no oracle)"
                n_rowsonly += 1
            else:
                try:
                    b = con.sql(sql).df()
                except Exception as e:
                    rec["err"] = f"oracle: {type(e).__name__}: {str(e)[:300]}"
                    results.setdefault(qname, {})[v] = rec
                    n_err += 1
                    print(f"ERR  {v:6s} {qname}: {rec['err']}", flush=True)
                    continue
                rec["oracle_rows"] = len(b)
                try:
                    diff = compare(a, b)
                except Exception as e:
                    # A comparison crash (unsortable object column etc.)
                    # is a per-query error, not a sweep abort (ADVICE r17).
                    rec["err"] = f"compare: {type(e).__name__}: {str(e)[:300]}"
                    results.setdefault(qname, {})[v] = rec
                    n_err += 1
                    print(f"ERR  {v:6s} {qname}: {rec['err']}", flush=True)
                    continue
                if diff:
                    rec["divergence"] = diff
                    n_div += 1
                    print(f"DIVG {v:6s} {qname}: {diff}", flush=True)
                else:
                    rec["status"] = "match"
                    n_ok += 1
            results.setdefault(qname, {})[v] = rec
            print(
                f"ok   {v:6s} {qname}: {rec.get('status','?')} "
                f"({rec.get('spark_rows')} rows)",
                flush=True,
            )
        con.close()

    summary = {
        "variants": variants,
        "partial": partial,
        "queries": len(queries),
        "match": n_ok,
        "rows_only": n_rowsonly,
        "divergences": n_div,
        "errors": n_err,
        "results": results,
    }
    with open(out_path, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(
        f"\nSWEEP: {len(queries)} queries x {len(variants)} variants — "
        f"{n_ok} match, {n_rowsonly} rows-only, {n_div} DIVERGENCES, {n_err} ERRORS"
        f" -> {out_path}"
    )
    return 2 if (n_div or n_err) else 0


if __name__ == "__main__":
    try:
        sys.exit(main())
    except Exception:
        traceback.print_exc()
        sys.exit(3)
