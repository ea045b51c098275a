#!/usr/bin/env python3
"""Build a 10x scale fixture whose DOCUMENTS carry FRESH text (r15 brief
item 8): scripts/make_sf1.py replicates every document byte-identically,
which makes every suffix gain >=10 twins and keeps the suffix-array
refinement's active set corpus-sized — the WORST case for the
settled/active cut. This variant samples new documents from the source
corpus's empirical word-frequency and length distributions (seeded, so
deterministic), giving the near-duplicate-free BEST case. Together the
two fixtures bracket real corpora.

All non-document tables are copied from an existing make_sf1.py output.

Usage: python3 scripts/make_sf1_fresh.py [sf1dir] [outdir]
       (defaults /tmp/sf1 /tmp/sf1f)
"""
import os
import random
import shutil
import sys

import duckdb

SRC = "/root/testdata/sf0.1"
SF1 = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf1"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1f"
R = 10

os.makedirs(OUT, exist_ok=True)
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "embeddings"]:
    shutil.copy(f"{SF1}/{t}.parquet", f"{OUT}/{t}.parquet")

con = duckdb.connect()
docs = con.execute(
    f"SELECT doc_id, text, lang, source FROM read_parquet('{SRC}/documents.parquet') "
    "ORDER BY doc_id").fetchall()
freqs = con.execute(
    f"""SELECT word, COUNT(*) FROM (SELECT unnest(string_split(text, ' ')) AS word
        FROM read_parquet('{SRC}/documents.parquet')) t GROUP BY word
        ORDER BY word""").fetchall()
words = [w for w, _ in freqs]
weights = [c for _, c in freqs]
lengths = [len(t.split(" ")) for _, t, _, _ in docs]

rng = random.Random(42)
rows = []
next_id = 0
for r in range(R):
    for (_, _, lang, source), n in zip(docs, lengths):
        rows.append((next_id, " ".join(rng.choices(words, weights, k=n)),
                     lang, source, 0))
        next_id += 1
rows = [(i, t, la, so, len(t)) for i, t, la, so, _ in rows]

con.execute("CREATE TABLE d (doc_id BIGINT, text VARCHAR, lang VARCHAR, "
            "source VARCHAR, n_chars BIGINT)")
con.executemany("INSERT INTO d VALUES (?, ?, ?, ?, ?)", rows)
con.execute(f"COPY d TO '{OUT}/documents.parquet' (FORMAT PARQUET)")
print(f"fresh-text sf1 fixture at {OUT}: {len(rows)} documents")
