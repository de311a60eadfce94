#!/usr/bin/env python3
"""Sharded replay of the q145_dedup_pipeline oracle (dev tooling only).

The monolithic oracle SQL (oracle_sql.json["q145_dedup_pipeline"]) never
completed at sf0.1: its recursive-CTE closure joins the full reachability
relation against the edge list with an OR predicate, which DuckDB executes
as a nested loop — O(|reach| x |edges|) comparisons per iteration (killed
at 4.3 h wall / 6.4 h CPU in round 9; PERF_NOTES R9.4). Judge verdict r9
"Next round" #1 directs the replay be finished SHARDED: stage the oracle's
intermediate relations to parquet, fan the expensive stage across DuckDB
processes, and run the closure ONCE over the union of verified edges.

Stage layout (all DuckDB except the closure; every floating-point-bearing
expression is copied VERBATIM from the oracle SQL so the verified edge set
is bit-identical to what the monolithic oracle would produce):
  1. sig.parquet    tokens + 8 minhashes per doc        (one DuckDB process)
  2. cand.parquet   DISTINCT banded candidate pairs     (one DuckDB process)
  3. edges-k.parquet exact-Jaccard >= 0.8 verify        (N DuckDB processes,
                     sharded by (ea * 31 + eb) % N — a pure partition of
                     cand, so the union over k is exactly the oracle's
                     `edges` relation)
  4. closure        connected components, min-id root   (union-find)
  5. compare        vs the Spark parquet dump, identical method to
                    tools/compare_oracle.py (sorted columns, astype(str))

The closure deviation is documented and cross-checked: the oracle's
recursive CTE computes all (node, root) same-component pairs and takes
min(root) per node — i.e. connected components labelled by min doc_id.
That is pure integer graph connectivity with NO floating-point semantics,
so a union-find over the identical edge set is the same function. Run with
--full-oracle at sf0.001/sf0.01 (where the monolithic SQL completes) to
assert the sharded path is byte-identical to the real oracle before
trusting it at sf0.1.

Usage:
  python3 tools/q145_shard.py <sfDir> <verifyOutDir> [--shards N]
      [--workdir D] [--full-oracle]
"""
import argparse, glob, json, os, sys, time
from concurrent.futures import ProcessPoolExecutor

import duckdb
import pandas as pd

# Verbatim fragments of the oracle SQL (oracle_sql.json["q145_dedup_pipeline"]).
TOKSET = ("list_distinct(list_filter(string_split_regex(lower(text), "
          r"'\s+'), t -> len(t) > 0))")
MINHASH_COLS = ", ".join(
    f"list_min(list_transform(toks, t -> ('0x' || "
    f"substr(md5('{seed}:' || t), {1 + 8 * part}, 8))::BIGINT)) AS mh{seed * 4 + part}"
    for seed in (0, 1) for part in range(4))
JACCARD_GE = ("len(list_intersect(sa.toks, sb.toks))::DOUBLE / "
              "(len(sa.toks) + len(sb.toks) - "
              "len(list_intersect(sa.toks, sb.toks))) >= 0.8")


def stage_sig(sf, workdir):
    out = f"{workdir}/sig.parquet"
    if os.path.exists(out):
        return
    duckdb.sql(f"""
        COPY (
          WITH t AS (SELECT doc_id, {TOKSET} AS toks
                     FROM read_parquet('{sf}/documents.parquet'))
          SELECT doc_id, toks, {MINHASH_COLS} FROM t
        ) TO '{out}' (FORMAT PARQUET)""")


def stage_cand(workdir):
    out = f"{workdir}/cand.parquet"
    if os.path.exists(out):
        return
    duckdb.sql(f"""
        COPY (
          WITH sig AS (SELECT * FROM read_parquet('{workdir}/sig.parquet')),
          banded AS (
            SELECT doc_id, 0 AS band_id,
              md5(mh0::VARCHAR || '_' || mh1::VARCHAR || '_' ||
                  mh2::VARCHAR || '_' || mh3::VARCHAR) AS band_key FROM sig
            UNION ALL
            SELECT doc_id, 1 AS band_id,
              md5(mh4::VARCHAR || '_' || mh5::VARCHAR || '_' ||
                  mh6::VARCHAR || '_' || mh7::VARCHAR) AS band_key FROM sig)
          SELECT DISTINCT a.doc_id AS ea, b.doc_id AS eb
          FROM banded a JOIN banded b
            ON a.band_id = b.band_id AND a.band_key = b.band_key
          WHERE a.doc_id < b.doc_id
        ) TO '{out}' (FORMAT PARQUET)""")


def verify_shard(args):
    workdir, k, n = args
    out = f"{workdir}/edges-{k}.parquet"
    if os.path.exists(out):
        return k, 0.0
    t0 = time.time()
    con = duckdb.connect()
    con.execute("SET threads = 1")  # shard-level parallelism only
    con.execute(f"""
        COPY (
          WITH sig AS (SELECT doc_id, toks
                       FROM read_parquet('{workdir}/sig.parquet')),
          cand AS (SELECT ea, eb FROM read_parquet('{workdir}/cand.parquet')
                   WHERE (ea * 31 + eb) % {n} = {k})
          SELECT ea, eb FROM cand
          JOIN sig sa ON cand.ea = sa.doc_id
          JOIN sig sb ON cand.eb = sb.doc_id
          WHERE {JACCARD_GE}
        ) TO '{out}.tmp.parquet' (FORMAT PARQUET)""")
    con.close()
    os.rename(f"{out}.tmp.parquet", out)
    return k, time.time() - t0


def closure(sf, workdir):
    """Union-find with min-id labels == the oracle's min(root) per node."""
    docs = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{sf}/documents.parquet') "
        "ORDER BY doc_id").fetchdf()["doc_id"].tolist()
    parent = {d: d for d in docs}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    edges = duckdb.sql(
        f"SELECT ea, eb FROM read_parquet('{workdir}/edges-*.parquet')").fetchdf()
    for ea, eb in zip(edges["ea"].tolist(), edges["eb"].tolist()):
        ra, rb = find(ea), find(eb)
        if ra != rb:                      # min-id root wins
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    roots = [find(d) for d in docs]
    return pd.DataFrame({
        "doc_id": pd.Series(docs, dtype="int64"),
        "cluster_id": pd.Series(roots, dtype="int64"),
        "is_keeper": pd.Series([d == r for d, r in zip(docs, roots)],
                               dtype="bool"),
    }), len(edges)


def compare(name, spark_dir, oracle_df):
    """Identical method to tools/compare_oracle.py."""
    spark_df = pd.concat(
        [pd.read_parquet(p) for p in glob.glob(f"{spark_dir}/*.parquet")])
    s = spark_df[sorted(spark_df.columns)].reset_index(drop=True)
    k = oracle_df[sorted(oracle_df.columns)].reset_index(drop=True)
    if list(s.columns) != list(k.columns):
        print(f"{name}: SCHEMA MISMATCH {list(s.columns)} vs {list(k.columns)}")
        return False
    if len(s) != len(k):
        print(f"{name}: ROWCOUNT {len(s)} vs {len(k)}")
        return False
    ss, ks = s.astype(str), k.astype(str)
    if not ss.equals(ks):
        diff = ss != ks
        cols = [c for c in s.columns if diff[c].any()]
        print(f"{name}: VALUE MISMATCH in cols {cols}")
        for c in cols[:3]:
            idx = diff[c].idxmax()
            print(f"  e.g. {c}: spark={ss[c][idx]} duck={ks[c][idx]} row={idx}")
        return False
    print(f"{name}: OK ({len(s)} rows)")
    return True


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("sf")
    ap.add_argument("out")
    ap.add_argument("--shards", type=int, default=24)
    ap.add_argument("--workdir", default=None)
    ap.add_argument("--full-oracle", action="store_true",
                    help="also run the monolithic recursive-CTE oracle and "
                         "assert the sharded result is byte-identical "
                         "(only feasible at small SF)")
    a = ap.parse_args()
    workdir = a.workdir or f"{a.out}/q145_shard_work"
    os.makedirs(workdir, exist_ok=True)

    t0 = time.time()
    stage_sig(a.sf, workdir)
    print(f"[q145] sig staged           {time.time() - t0:8.1f} s", flush=True)
    stage_cand(workdir)
    n_cand = duckdb.sql(
        f"SELECT count(*) FROM read_parquet('{workdir}/cand.parquet')").fetchone()[0]
    print(f"[q145] cand staged ({n_cand} pairs) {time.time() - t0:8.1f} s",
          flush=True)

    with ProcessPoolExecutor(max_workers=min(a.shards, os.cpu_count())) as ex:
        for k, dt in ex.map(verify_shard,
                            [(workdir, k, a.shards) for k in range(a.shards)]):
            print(f"[q145] verify shard {k:3d}/{a.shards}  {dt:8.1f} s",
                  flush=True)

    oracle_df, n_edges = closure(a.sf, workdir)
    print(f"[q145] closure over {n_edges} edges  {time.time() - t0:8.1f} s",
          flush=True)

    ok = compare("q145_dedup_pipeline (sharded oracle)",
                 f"{a.out}/q145_dedup_pipeline", oracle_df)

    if a.full_oracle:
        sql = json.load(open(f"{a.out}/oracle_sql.json"))["q145_dedup_pipeline"]
        con = duckdb.connect()
        con.execute(f"""CREATE VIEW documents AS
            SELECT * FROM read_parquet('{a.sf}/documents.parquet')""")
        full = con.execute(sql).fetchdf()
        f = full[sorted(full.columns)].reset_index(drop=True).astype(str)
        g = oracle_df[sorted(oracle_df.columns)].reset_index(drop=True).astype(str)
        same = list(f.columns) == list(g.columns) and f.equals(g)
        print(f"[q145] sharded == monolithic oracle: {same}")
        ok = ok and same

    print(f"[q145] total {time.time() - t0:.1f} s  result: "
          f"{'PASS' if ok else 'FAIL'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
