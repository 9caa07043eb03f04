#!/usr/bin/env python3
"""Synthesize 30x-scaled inputs for the two documented superlinear keys
(round-11 verdict item #9): two points don't make a curve, so the
third scale decides whether each key's growth is drifting toward the
audit threshold or saturating.

 - /tmp/scale30_long: events only, 30 copies shifted by 31-day blocks
   on the SAME series (bars/series 30 -> 900) — kendall_trend's stress
   axis, now backed by the O(m log m) Fenwick pass.

 - /tmp/scale30_docs: documents only, 30 shifted copies as NEW docs
   (the WIDE axis dedup_simhash measured 14.8x on at 10x). Copies get
   the same deterministic content-seeded word permutation as
   make_scale10.py, so each copy's internal dup structure is preserved
   while cross-copy char-5 Jaccard stays under every LSH trigger.

 - /tmp/scale30_wide: documents AND embeddings at 30x (r14: third
   points for bm25_topk and knn_graph, the two highest unflagged 10x
   wide ratios) — same content-seeded word permutation for docs, same
   deterministic sign flips for vectors as make_scale10.py.

Tables not scaled are symlinked from sf0.1. Deterministic throughout.
"""
import os
import duckdb

SF = "/root/testdata/sf0.1"
LONG30 = "/tmp/scale30_long"
DOCS30 = "/tmp/scale30_docs"
WIDE30 = "/tmp/scale30_wide"
COPIES = 30
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
    os.makedirs(LONG30, exist_ok=True)
    os.makedirs(DOCS30, exist_ok=True)

    con.execute(f"""
      COPY (
        SELECT event_id + c * 100000 AS event_id,
               ts + INTERVAL 31 DAY * c AS ts,
               user_id, event_type, value, props
        FROM read_parquet('{SF}/events.parquet'), copies
      ) TO '{LONG30}/events.parquet' (FORMAT PARQUET)""")
    link_rest(LONG30, {"events"})

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
      ) TO '{DOCS30}/documents.parquet' (FORMAT PARQUET)""")
    link_rest(DOCS30, {"documents"})

    os.makedirs(WIDE30, exist_ok=True)
    if not os.path.exists(f"{WIDE30}/documents.parquet"):
        os.symlink(f"{DOCS30}/documents.parquet", f"{WIDE30}/documents.parquet")
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
      ) TO '{WIDE30}/embeddings.parquet' (FORMAT PARQUET)""")
    link_rest(WIDE30, {"documents", "embeddings"})

    for d, t in ((LONG30, "events"), (DOCS30, "documents"),
                 (WIDE30, "embeddings")):
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{d}/{t}.parquet')").fetchone()[0]
        print(f"{d}: {t} rows = {n}")
    print("done")


if __name__ == "__main__":
    main()
