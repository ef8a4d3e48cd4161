"""Edge-case-augmented test dataset for the cross-engine parity sweep.

Copies sf0.001 and appends pathological documents rows: empty text,
single token, digits/punctuation only, whitespace-only, a lone
stopword, one very long token, unicode, heavy self-repetition, mixed
tab/newline whitespace, and NULL text / NULL n_chars. These are the
inputs that hide engine-divergence bugs the normal synthetic corpus
never exercises — the round-5 sweep over this dir caught three real
ones in a registry that was 100% green on sf0.01:

- t19's bigram transform threw INVALID_ARRAY_INDEX under ANSI for
  0/1-token docs (sequence(1, 0) is descending in Spark);
- d01/d02's DuckDB oracles grouped NULL-text rows into a bogus
  md5(NULL) duplicate group where the operators (documented) exclude
  them;
- s07's NTILE ordered NULL lengths FIRST in Spark and LAST in DuckDB;
- and the edge EVENTS (duplicate timestamps, NULL/empty/malformed-JSON
  props) caught f05/f08/f13: DuckDB's strict json_extract THREW on a
  malformed props payload where Spark's get_json_object returns NULL —
  oracles now carry a json_valid guard, and f13 parses with
  try_parse_json (plain parse_json fails the job on the first broken
  payload in a 100 TB log).

Protocol: build this dir, then run the ENTIRE oracle suite against it —
the oracles recompute on the same augmented parquet, so every query is
value-checked under edge inputs:

    python tools/make_sfedge.py
    SPARK_GRAFT_TEST_SF_DIR=/tmp/sfedge \
        python -m pytest tests/test_oracle_parity.py -q

Run it whenever text-facing queries or oracles change; log sweeps in
PARITY.md.
"""

from __future__ import annotations

import os
import shutil

import duckdb

SRC = os.environ.get("SPARK_GRAFT_SFEDGE_SRC", "/root/testdata/sf0.001")
DST = os.environ.get("SPARK_GRAFT_SFEDGE_DIR", "/tmp/sfedge")

EDGE_DOCS = """
    (900001, '', 'en', 'edge', 0),
    (900002, 'x', 'en', 'edge', 1),
    (900003, '123 456 %% !!', 'en', 'edge', 12),
    (900004, '   ', 'en', 'edge', 3),
    (900005, 'the', 'en', 'edge', 3),
    (900006, repeat('superlongtoken', 40), 'en', 'edge', 560),
    (900007, 'héllo wörld ümlaut straße', 'xx', 'edge', 24),
    (900008, 'same same same same same same same same', 'en', 'edge', 39),
    (900009, e'tab\\tsep\\nnewline  multi  space', 'en', 'edge', 28),
    (900010, NULL, 'en', 'edge', NULL)
"""


#: Edge events: EXACT-duplicate (user_id, ts) pairs (every window
#: tie-break in the w/ts/st series must resolve identically on both
#: engines), zero and negative values, NULL props, and a user with a
#: single event. Deliberately NO NULL ts: event-time is the ingest
#: contract (sources/io.py quarantines rows that violate the enforced
#: schema), so a NULL-ts row can never reach these queries.
EDGE_EVENTS = """
    (9900001, TIMESTAMP '2024-01-10 12:00:00', 990001, 'view',  0.00, NULL),
    (9900002, TIMESTAMP '2024-01-10 12:00:00', 990001, 'click', -5.25, 'p'),
    (9900003, TIMESTAMP '2024-01-10 12:00:00', 990001, 'view',  1.50, 'p'),
    (9900004, TIMESTAMP '2024-01-10 12:00:01', 990002, 'purchase', 0.01, '')
"""


def main() -> None:
    os.makedirs(DST, exist_ok=True)
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "embeddings"):
        shutil.copy(f"{SRC}/{t}.parquet", f"{DST}/{t}.parquet")
    con = duckdb.connect()
    con.sql(f"""
        COPY (
          SELECT * FROM read_parquet('{SRC}/documents.parquet')
          UNION ALL
          SELECT * FROM (VALUES {EDGE_DOCS})
            v(doc_id, text, lang, source, n_chars)
        ) TO '{DST}/documents.parquet' (FORMAT PARQUET)
    """)
    # keep ts in the SOURCE file's physical type (nanos long or
    # timestamp) by letting duckdb unify the union branches
    con.sql(f"""
        COPY (
          SELECT * FROM read_parquet('{SRC}/events.parquet')
          UNION ALL
          SELECT event_id, ts, user_id, event_type, value, props
          FROM (VALUES {EDGE_EVENTS})
            v(event_id, ts, user_id, event_type, value, props)
        ) TO '{DST}/events.parquet' (FORMAT PARQUET)
    """)
    n = con.sql(f"SELECT COUNT(*) "
                f"FROM read_parquet('{DST}/documents.parquet')").fetchone()[0]
    print(f"{DST}: documents={n} (10 edge rows appended)")


if __name__ == "__main__":
    main()
