#!/usr/bin/env python3
"""Linear union-find oracle for the dedup CLOSURE queries — the check
DuckDB cannot do at scale (its recursive-CTE transitive closure is
O(diameter) self-joins; the sf10 attempt ground 3h+ before being
killed), done the obvious way instead: the pair dumps are already
hash-exact against DuckDB, so a driver-side union-find over them
(O(E*alpha), seconds at sf10's 162k pairs) reproduces the exact min-id
components, and every closure query is a deterministic replay on top:

  q_dedup_cluster / q_dedup_cluster_star : (doc_id, min-id cluster, is_rep)
  q_dedup_keep_best : per >=2-member cluster, max-quality member,
                      min-id tiebreak (operators/Dedup.keepBestClusters)
  q_dedup_apply     : per-lang (count, sum n_chars) over min-id survivors
  q_chain_recall    : fraction of the union stage's verified pairs that
                      land in one sorted-chain component (needs the
                      q_dedup_union dump; skipped when absent — at sf10
                      the union stage is a scoped <=sf1 diagnostic)

Also prints the BANDED-denominator chain recall (fraction of the
q_dedup_minhash pairs connected by the chains) — the sf10 ladder proxy
(the union denominator is infeasible there), plus the same for an
optional alternate-config pair dump (--alt-pairs DIR NAME, e.g. a 4x8
run) so the recall ladder gets an sf10 row.

Usage:
  python3 tools/uf_compare.py VERIFY_OUT SF_DIR [--artifact OUT.json]
      [--alt-pairs DIR NAME]...

With --artifact, writes/merges driver-format entries
({q: {rows_match, schema_match, hash_match, spark_rows, oracle_rows,
err, checked}}) into OUT.json, same shape as tools/compare.py.
"""
import glob
import json
import os
import sys

import pyarrow.parquet as pq


def read_pq(path_or_dir):
    files = sorted(glob.glob(f"{path_or_dir}/*.parquet")) \
        if os.path.isdir(path_or_dir) else [path_or_dir]
    import pyarrow as pa
    return pa.concat_tables([pq.read_table(f) for f in files])


class UF:
    __slots__ = ("parent",)

    def __init__(self):
        self.parent = {}

    def find(self, x):
        p = self.parent
        root = x
        while p.get(root, root) != root:
            root = p[root]
        while p.get(x, x) != x:  # path compression
            p[x], x = root, p[x]
        return root

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            # min-id root so find() directly yields the cluster label
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra
            self.parent.setdefault(ra, ra)


def components(pairs_tbl):
    uf = UF()
    for a, b in zip(pairs_tbl["id_a"].to_pylist(),
                    pairs_tbl["id_b"].to_pylist()):
        uf.union(a, b)
    return {x: uf.find(x) for x in list(uf.parent)}


def schema_check(table, expected):
    """(ok, err) — expected column names IN ORDER plus coarse pyarrow
    type kinds ('int' / 'float' / 'str') against the parquet schema."""
    import pyarrow.types as pt
    kinds = {"int": pt.is_integer, "float": pt.is_floating,
             "str": lambda t: pt.is_string(t) or pt.is_large_string(t)}
    names, want = list(table.schema.names), [n for n, _ in expected]
    if names != want:
        return False, f"columns {names} != expected {want}"
    for n, kind in expected:
        t = table.schema.field(n).type
        if not kinds[kind](t):
            return False, f"column {n}: {t} is not {kind}"
    return True, None


def frame_eq(name, table, expected_cols, oracle_rows):
    """Exact multiset compare of a dumped parquet table against oracle
    tuples, driver-entry dict. schema_match is a REAL check (names in
    order + coarse type kinds) — a renamed / reordered / type-drifted
    dump reads as schema_match: False instead of crashing on a missing
    name or silently passing as True."""
    ok_schema, schema_err = schema_check(table, expected_cols)
    entry = {"checked": True, "err": schema_err,
             "spark_rows": table.num_rows, "oracle_rows": len(oracle_rows),
             "rows_match": table.num_rows == len(oracle_rows),
             "schema_match": ok_schema, "hash_match": False}
    if not ok_schema:
        print(f"  {name}: SCHEMA MISMATCH: {schema_err}")
        return entry
    got = list(zip(*(table[c].to_pylist() for c, _ in expected_cols))) \
        if table.num_rows else []
    s, o = sorted(got), sorted(oracle_rows)
    entry["hash_match"] = s == o
    if not entry["hash_match"]:
        bad = next((i for i, (x, y) in enumerate(zip(s, o)) if x != y),
                   min(len(s), len(o)))
        print(f"  {name}: MISMATCH at sorted row {bad}: "
              f"spark={s[bad] if bad < len(s) else '<none>'} "
              f"oracle={o[bad] if bad < len(o) else '<none>'}")
    return entry


def main():
    args = sys.argv[1:]
    alt = []
    artifact = None
    while "--alt-pairs" in args:
        i = args.index("--alt-pairs")
        alt.append((args[i + 1], args[i + 2]))
        del args[i:i + 3]
    if "--artifact" in args:
        i = args.index("--artifact")
        artifact = args[i + 1]
        del args[i:i + 2]
    out_dir, sf_dir = args

    docs = read_pq(f"{sf_dir}/documents.parquet") \
        .select(["doc_id", "lang", "n_chars"])
    doc_ids = docs["doc_id"].to_pylist()
    langs = docs["lang"].to_pylist()
    chars = docs["n_chars"].to_pylist()

    mpairs = read_pq(f"{out_dir}/q_dedup_minhash_sorted")
    comp = components(mpairs)
    print(f"docs={len(doc_ids)} chain_pairs={mpairs.num_rows} "
          f"chained_ids={len(comp)}")

    results = {}

    # q_dedup_cluster / q_dedup_cluster_star: full-corpus label frame
    expect_cluster = [(d, comp.get(d, d), int(d == comp.get(d, d)))
                      for d in doc_ids]
    for q in ("q_dedup_cluster", "q_dedup_cluster_star"):
        if not os.path.isdir(f"{out_dir}/{q}"):
            continue
        t = read_pq(f"{out_dir}/{q}")
        results[q] = frame_eq(q, t, [("doc_id", "int"), ("cluster", "int"),
                                     ("is_rep", "int")], expect_cluster)

    # q_dedup_keep_best: >=2-member clusters, max quality, min-id tiebreak
    if os.path.isdir(f"{out_dir}/q_dedup_keep_best"):
        best, members = {}, {}
        for d, c in zip(doc_ids, chars):
            label = comp.get(d, d)
            members[label] = members.get(label, 0) + 1
            cur = best.get(label)
            if cur is None or (c, -d) > (cur[0], -cur[1]):
                best[label] = (c, d)
        expect_kb = [(label, members[label], best[label][1], best[label][0])
                     for label in members if members[label] >= 2]
        t = read_pq(f"{out_dir}/q_dedup_keep_best")
        results["q_dedup_keep_best"] = frame_eq(
            "q_dedup_keep_best", t,
            [("cluster", "int"), ("n_members", "int"),
             ("kept_doc_id", "int"), ("kept_chars", "int")], expect_kb)

    # q_dedup_apply: per-lang survivor accounting over min-id reps
    if os.path.isdir(f"{out_dir}/q_dedup_apply"):
        agg = {}
        for d, lg, c in zip(doc_ids, langs, chars):
            if comp.get(d, d) == d:
                n, s = agg.get(lg, (0, 0))
                agg[lg] = (n + 1, s + c)
        expect_apply = [(lg, n, s) for lg, (n, s) in agg.items()]
        t = read_pq(f"{out_dir}/q_dedup_apply")
        results["q_dedup_apply"] = frame_eq(
            "q_dedup_apply", t,
            [("lang", "str"), ("n_docs", "int"), ("sum_chars", "int")],
            expect_apply)

    def connected_frac(pairs_tbl, cmap, label):
        n = pairs_tbl.num_rows
        ok = sum(1 for a, b in zip(pairs_tbl["id_a"].to_pylist(),
                                   pairs_tbl["id_b"].to_pylist())
                 if cmap.get(a) is not None and cmap.get(a) == cmap.get(b))
        # replicate the query's floor(x*1e6+0.5)/1e6 rounding
        import math
        rec = math.floor(ok / n * 1e6 + 0.5) / 1e6 if n else None
        print(f"  {label}: {ok}/{n} connected, recall={rec}")
        return n, ok, rec

    # q_chain_recall: exact replay when the union dump exists
    if os.path.isdir(f"{out_dir}/q_dedup_union") and \
            os.path.isdir(f"{out_dir}/q_chain_recall"):
        union = read_pq(f"{out_dir}/q_dedup_union")
        n, ok, rec = connected_frac(union, comp, "chain recall (union denom)")
        t = read_pq(f"{out_dir}/q_chain_recall")
        results["q_chain_recall"] = frame_eq(
            "q_chain_recall", t,
            [("n_union", "int"), ("n_chained", "int"),
             ("chain_recall", "float")], [(n, ok, rec)])

    # banded-denominator proxy (the feasible sf10 ladder readout)
    ladder = []
    if alt and not os.path.isdir(f"{out_dir}/q_dedup_minhash"):
        # --alt-pairs rungs are scored AGAINST the banded dump; without
        # it the requested ladder work cannot run — fail loudly rather
        # than exit 0 looking like a clean run
        sys.exit(f"ERROR: --alt-pairs given but {out_dir}/q_dedup_minhash "
                 "(the banded denominator dump) is missing — run Verify "
                 "with q_dedup_minhash first")
    if os.path.isdir(f"{out_dir}/q_dedup_minhash"):
        banded = read_pq(f"{out_dir}/q_dedup_minhash")
        n, ok, rec = connected_frac(banded, comp,
                                    "chain recall (banded denom, production)")
        ladder.append({"config": "production", "n_pairs": mpairs.num_rows,
                       "n_banded": n, "n_chained": ok, "recall_banded": rec})
        for alt_dir, alt_name in alt:
            apairs = read_pq(alt_dir)
            acomp = components(apairs)
            n, ok, rec = connected_frac(banded, acomp,
                                        f"chain recall (banded denom, {alt_name})")
            ladder.append({"config": alt_name, "n_pairs": apairs.num_rows,
                           "n_banded": n, "n_chained": ok,
                           "recall_banded": rec})

    for q, e in sorted(results.items()):
        ok = e["rows_match"] and e["schema_match"] and e["hash_match"]
        print(f"{q}: {'OK' if ok else 'FAIL'} "
              f"(rows {e['spark_rows']} vs {e['oracle_rows']})")
    if artifact:
        merged = json.load(open(artifact)) if os.path.exists(artifact) else {}
        merged.update(results)
        if ladder:
            merged["_chain_recall_banded"] = {"sf": sf_dir, "configs": ladder}
        json.dump(merged, open(artifact, "w"), indent=1, sort_keys=True)
        print(f"wrote {artifact}")
    bad = [q for q, e in results.items()
           if not (e["rows_match"] and e["schema_match"] and e["hash_match"])]
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
