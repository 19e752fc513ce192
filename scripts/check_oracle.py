#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracle parity (mimics the driver).

Usage: python3 scripts/check_oracle.py <verify_out_dir> <sf_dir>

Reads each <out>/<name> parquet written by graft.Verify, runs the matching
oracle SQL from <out>/oracle_sql.json in DuckDB over the same testdata
parquet, sorts columns by name + rows by all columns, and compares values
exactly (reporting max float deltas when not bit-equal).

Dev-only tool: NOT part of the shipped library (driver-side python env).
"""
import json, sys, glob, os
# Arrow's bundled jemalloc/mimalloc pool can fail small mallocs with a
# spurious ArrowMemoryError from fragmentation across a ~215-query sweep
# (observed r14: deterministic 1-3 MB malloc failures with >120 GB free,
# gone with the system allocator). Must be set before Arrow initializes
# its default pool, i.e. before the pandas/pyarrow imports below.
os.environ.setdefault("ARROW_DEFAULT_MEMORY_POOL", "system")
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame):
    """Returns (canonical_df, decimal_cols).

    Decimal columns (Spark DECIMAL lands as object-dtype decimal.Decimal in
    pandas) are converted to float so the value comparison still runs, and
    reported separately: the DRIVER's compare is exact, so a Decimal-vs-float
    drift hash-fails there even when every value matches. Surfacing it here
    as DTYPE (not a string-inequality VALUE mismatch) makes the verdict
    actionable pre-commit (VERDICT r7 #2a).
    """
    import decimal
    df = df.reindex(sorted(df.columns), axis=1)
    decimal_cols = set()
    # normalize timestamps to us precision (spark writes us, duckdb may differ)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
            try:
                df[c] = df[c].dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
        d = df[c].dtype
        if d == object:
            if df[c].map(lambda v: isinstance(v, decimal.Decimal)).any():
                decimal_cols.add(c)
                df[c] = df[c].astype(float)
            else:
                df[c] = df[c].map(lambda v: tuple(v) if isinstance(v, (list, np.ndarray)) else v)
    return (df.sort_values(by=list(df.columns), kind="mergesort")
              .reset_index(drop=True), decimal_cols)

def embedding_dim(out_dir):
    """Single-source the embeddings dim (ADVICE r12): the engine writes its
    EFFECTIVE dim to verify_meta.json; the oracle reads that. The env var
    GRAFT_EMBEDDING_DIM remains the way to SET it (Verify copies env ->
    session conf), so if both exist they must agree — a disagreement means
    the two channels drifted and the compare would silently diff data."""
    meta_path = os.path.join(out_dir, "verify_meta.json")
    meta_dim = None
    if os.path.exists(meta_path):
        raw = json.load(open(meta_path)).get("embedding_dim")
        if raw is None:
            # a present-but-keyless meta is a stale/corrupt Verify output:
            # fail the gate with a clear verdict, not a raw TypeError
            sys.exit(f"gate failure: {meta_path} exists but has no "
                     f"'embedding_dim' key — stale or corrupt Verify "
                     f"output; re-run graft.Verify into this out dir")
        meta_dim = int(raw)
    env = os.environ.get("GRAFT_EMBEDDING_DIM")
    if env is not None and meta_dim is not None and int(env) != meta_dim:
        sys.exit(f"config drift: GRAFT_EMBEDDING_DIM={env} but the engine "
                 f"ran with embedding_dim={meta_dim} (verify_meta.json) — "
                 f"re-run graft.Verify with the same env")
    if meta_dim is not None:
        return meta_dim
    return int(env) if env is not None else 64

def connect(sf_dir, dim=64):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p)[:-len(".parquet")]
        # driver testdata ships single parquet FILES; Spark-written tables
        # (ScaleProbe replica corpora) are DIRECTORIES of part files —
        # support both so the sweep also runs at probe scales
        src = os.path.join(p, "*.parquet") if os.path.isdir(p) else p
        # mirror Tables' events-ts dispatch: ScaleProbe replica corpora
        # store ts as raw INT64 nanos (the driver's NANOS encoding read
        # via nanosAsLong) — convert exactly like the engine does
        # (floor-truncate to micros) so oracle and Spark see the same
        # instants at probe scales too
        if name == "events":
            row = con.execute(
                f"SELECT typeof(ts) FROM read_parquet('{src}') LIMIT 1"
            ).fetchone()
            t = row[0] if row else None  # empty events: plain view below
            if t == "BIGINT":
                con.execute(
                    f"CREATE VIEW {name} AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) "
                    f"FROM read_parquet('{src}')")
                continue
        # mirror Tables' embeddings scan validation (Tables.EmbeddingDim):
        # malformed vectors (null/empty/off-dim) are dropped by the engine
        # at the scan, so the oracle must read the same validated row set
        # — on driver testdata this predicate is a no-op
        if name == "embeddings":
            con.execute(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}') "
                f"WHERE embedding IS NOT NULL AND len(embedding) = {dim}")
            continue
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    return con

def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    dim = embedding_dim(out_dir)
    con = connect(sf_dir, dim)
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    results = {}
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    # bound-check verdicts for the declared-no-oracle sketch twins
    # (graft.Verify writes them; r13): a twin is only "clean" when its
    # error bound against the exact sibling held
    bounds_path = os.path.join(out_dir, "approx_bounds.json")
    bounds = json.load(open(bounds_path)) if os.path.exists(bounds_path) \
        else {}
    for name in names:
        spark_df = pd.read_parquet(os.path.join(out_dir, name))
        if name not in oracles:
            b = bounds.get(name)
            if b is None:
                # A no-oracle dump with no bounds verdict FAILS: every
                # declared sketch twin gets a bounds entry from a full
                # Verify run, so a missing entry means this dump is stale
                # (a filtered re-run rewrote approx_bounds.json without
                # producing this query — the symmetric half of the
                # stale-bounds fix: otherwise a standing BOUNDS-FAIL could
                # be laundered green by a later filtered run that leaves
                # the failing dump in place but empties the bounds file).
                results[name] = (f"NO-BOUNDS rows={len(spark_df)} — twin "
                                 "dump has no bounds verdict (stale dump "
                                 "from an earlier run? re-run full Verify "
                                 "into a clean outDir)")
            elif b.get("bounds_ok"):
                results[name] = (f"NO-ORACLE bounds_ok rows={len(spark_df)} "
                                 f"({b.get('detail')})")
            else:
                results[name] = f"BOUNDS-FAIL {b.get('detail')}"
            continue
        try:
            oracle_df = con.execute(oracles[name]).df()
        except Exception as e:
            # A long sweep occasionally hits a transient DuckDB
            # "Out of Memory" on one heavy oracle (allocator fragmentation
            # across ~200 queries on one connection, not real exhaustion —
            # the same SQL passes in isolation). Retry ONCE on a fresh
            # connection before reporting; real SQL errors still surface.
            if "Out of Memory" in str(e) or "bad allocation" in str(e):
                # build the replacement FIRST so a failed reconnect can't
                # leave `con` closed and poison every remaining query
                try:
                    new_con = connect(sf_dir, dim)
                except Exception:
                    results[name] = f"ORACLE-SQL-ERROR: {e}"
                    continue
                try:
                    con.close()
                except Exception:
                    pass
                con = new_con
                try:
                    oracle_df = con.execute(oracles[name]).df()
                except Exception as e2:
                    results[name] = f"ORACLE-SQL-ERROR: {e2}"
                    continue
            else:
                results[name] = f"ORACLE-SQL-ERROR: {e}"
                continue
        (a, a_dec), (b, b_dec) = canon(spark_df), canon(oracle_df)
        if list(a.columns) != list(b.columns):
            results[name] = f"SCHEMA-MISMATCH spark={list(a.columns)} oracle={list(b.columns)}"
            continue
        if len(a) != len(b):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(a)} oracle={len(b)}"
            continue
        diffs = []
        for c in a.columns:
            av, bv = a[c], b[c]
            if av.dtype.kind == "f" or bv.dtype.kind == "f":
                try:
                    aa, bb = av.astype(float).values, bv.astype(float).values
                except TypeError:
                    # float on one side, non-numeric (e.g. datetime) on the
                    # other: a dtype drift, not a crash of the whole sweep
                    diffs.append(f"{c}: dtype mismatch {av.dtype} vs {bv.dtype}")
                    continue
                both_nan = np.isnan(aa) & np.isnan(bb)
                neq = ~both_nan & (aa != bb)
                if neq.any():
                    mx = np.nanmax(np.abs(aa[neq] - bb[neq]))
                    diffs.append(f"{c}: {neq.sum()} cells differ, max|Δ|={mx:.3e}")
            else:
                try:
                    eq = (av.values == bv.values) | (av.isna().values & b[c].isna().values)
                except Exception:
                    eq = av.astype(str).values == bv.astype(str).values
                if not eq.all():
                    i = int(np.argmin(eq))
                    diffs.append(f"{c}: {(~eq).sum()} cells differ, first at row {i}: {av.iloc[i]!r} vs {bv.iloc[i]!r}")
        if diffs:
            results[name] = "VALUE-MISMATCH " + "; ".join(diffs)
        elif a_dec != b_dec:
            # values equal but physical types drift — the driver's exact
            # compare WILL hash-fail this; flag loudly as dtype, not value
            results[name] = ("DTYPE-MISMATCH (values equal) "
                             f"spark_decimal={sorted(a_dec)} oracle_decimal={sorted(b_dec)}")
        else:
            results[name] = "OK rows=%d" % len(a)
    width = max(len(n) for n in results) if results else 10
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "NO-ORACLE")))
    for name, verdict in sorted(results.items()):
        print(f"{name:<{width}}  {verdict}")
    print(f"\n{n_ok}/{len(results)} clean")
    sys.exit(0 if n_ok == len(results) else 1)

if __name__ == "__main__":
    main()
