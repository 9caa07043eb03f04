#!/usr/bin/env python3
"""Synthesize 10x-scaled copies of the sf0.1 tables for the scaling
audit (SCALING_rN.json): every 100 TB claim in the repo is plan-shape
asserted by specs; this gives it an empirical leg by timing the most
expensive keys at sf0.1 and at 10x and publishing the ratios.

Two axes, because the two failure modes differ:

 - WIDE (/tmp/scale10_wide): 10 shifted copies as NEW series/docs/
   orders — series count x10, per-series history unchanged. The
   realistic 100 TB shape for the fact tables; stresses shuffle volume
   and scan width. Linear ops should come out ~10x (log-factor slack).

 - LONG (/tmp/scale10_long): events only — 10 copies shifted by 31-day
   blocks on the SAME series, so bars/series goes 30 -> 300. Stresses
   the O(bars^2) pair folds (kendall) and the O(m^2) concat-fold state
   arrays the verdict flagged: a key superlinear on this axis would
   choke on a 10-year series at 100 TB even though the wide axis hides
   it.

Tables not scaled are symlinked from sf0.1 so every query still loads.
Deterministic throughout (no random()): copy index drives the shifts,
a hash of (id, element index, copy) drives the embedding sign flips —
re-running reproduces byte-identical inputs.
"""
import os
import sys
import duckdb

SF = "/root/testdata/sf0.1"
WIDE = "/tmp/scale10_wide"
LONG = "/tmp/scale10_long"
COPIES = 10
ALL_TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]


def link_rest(outdir, scaled):
    for t in ALL_TABLES:
        if t in scaled:
            continue
        src = f"{SF}/{t}.parquet"
        dst = f"{outdir}/{t}.parquet"
        if os.path.exists(src) and not os.path.exists(dst):
            os.symlink(src, dst)


def main():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW copies AS SELECT range AS c FROM range({COPIES})")

    os.makedirs(WIDE, exist_ok=True)
    os.makedirs(LONG, exist_ok=True)

    # ---- WIDE: new series / docs / vectors / orders per copy ----
    con.execute(f"""
      COPY (
        SELECT event_id + c * 100000 AS event_id, ts,
               user_id + c * 1500 AS user_id, event_type, value, props
        FROM read_parquet('{SF}/events.parquet'), copies
      ) TO '{WIDE}/events.parquet' (FORMAT PARQUET)""")
    # copies get a DETERMINISTIC CONTENT-SEEDED WORD PERMUTATION
    # (round-11 audit lesson: an appended suffix tag leaves the char-5
    # shingle sets ~80% identical, so every doc gained ~10 true
    # near-dups and the dedup keys measured dup-rate inflation, not
    # scaling). Sort keys hash (word, position, copy): identical texts
    # permute identically, so each copy's INTERNAL dup structure — the
    # dup RATE — is preserved exactly, while cross-copy char-5 Jaccard
    # drops to ~0.27, under every LSH trigger. Vocabulary and length
    # stats are untouched (same words, same counts).
    con.execute(f"""
      COPY (
        SELECT doc_id + c * 5000 AS doc_id,
               CASE WHEN c = 0 THEN text
                    ELSE array_to_string(list_transform(
                      list_sort(list_transform(string_split(text, ' '),
                        (w, i) -> {{'h': hash(w || '_' || i || '_' || c),
                                    'w': w}})),
                      s -> s.w), ' ') END AS text,
               lang, source, n_chars
        FROM read_parquet('{SF}/documents.parquet'), copies
      ) TO '{WIDE}/documents.parquet' (FORMAT PARQUET)""")
    # deterministic sign flips decorrelate copies (adding a small
    # constant would leave cosine ~ 1 and multiply every near-dup
    # group by the copy count)
    con.execute(f"""
      COPY (
        SELECT vec_id + c * 2000 AS vec_id,
               CASE WHEN c = 0 THEN embedding
                    ELSE list_transform(embedding,
                      (e, j) -> CASE WHEN hash(vec_id * 131 + j * 13 + c * 7) % 2 = 0
                                     THEN e ELSE -e END)
               END AS embedding,
               label
        FROM read_parquet('{SF}/embeddings.parquet'), copies
      ) TO '{WIDE}/embeddings.parquet' (FORMAT PARQUET)""")
    con.execute(f"""
      COPY (
        SELECT l_orderkey + c * 150000 AS l_orderkey,
               l_partkey, l_suppkey, l_linenumber, l_quantity,
               l_extendedprice, l_discount, l_tax, l_returnflag,
               l_linestatus, l_shipdate
        FROM read_parquet('{SF}/lineitem.parquet'), copies
      ) TO '{WIDE}/lineitem.parquet' (FORMAT PARQUET)""")
    link_rest(WIDE, {"events", "documents", "embeddings", "lineitem"})

    # ---- LONG: same series, 10x the history ----
    con.execute(f"""
      COPY (
        SELECT event_id + c * 100000 AS event_id,
               ts + INTERVAL 31 DAY * c AS ts,
               user_id, event_type, value, props
        FROM read_parquet('{SF}/events.parquet'), copies
      ) TO '{LONG}/events.parquet' (FORMAT PARQUET)""")
    link_rest(LONG, {"events"})

    for d in (WIDE, LONG):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{d}/events.parquet')").fetchone()[0]
        print(f"{d}: events rows = {n}")
    print("done")


if __name__ == "__main__":
    sys.exit(main())
