"""Build an approximate scaled copy of a testdata sf dir for PERFORMANCE
measurement only (guide §1: optimizations must hold at the driver's
larger measurement sf, and /root/testdata is read-only).

Each replica k of sf0.1 gets shifted ids, perturbed text (one appended
token) and rotated embeddings so dedup/LSH operators see realistic (not
degenerate-duplicate) distributions.  NOT the driver's generator — the
output is for relative before/after timing, never for correctness
oracles (use the real sf dirs for those).

Usage: python tools/make_scale_dir.py /root/testdata/sf0.1 /tmp/sfscale10 10
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb


def main() -> None:
    src, dst, mult = sys.argv[1], sys.argv[2], int(sys.argv[3])
    Path(dst).mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"SET threads TO 16")

    counts = {}
    for t in ("region nation customer supplier part orders lineitem "
              "events documents embeddings").split():
        counts[t] = con.execute(
            f"SELECT count(*) FROM '{src}/{t}.parquet'"
        ).fetchone()[0]

    # tiny dims: copy as-is
    for t in ("region", "nation"):
        con.execute(
            f"COPY (SELECT * FROM '{src}/{t}.parquet') TO "
            f"'{dst}/{t}.parquet' (FORMAT parquet)"
        )

    def replicate(table: str, select_k: str) -> None:
        sels = " UNION ALL ".join(
            select_k.format(k=k, src=f"'{src}/{table}.parquet'")
            for k in range(mult)
        )
        con.execute(
            f"COPY ({sels}) TO '{dst}/{table}.parquet' (FORMAT parquet)"
        )

    n = counts["customer"]
    replicate("customer", "SELECT c_custkey + {k}*" + str(n) +
              " AS c_custkey, * EXCLUDE (c_custkey) FROM {src}")
    n = counts["supplier"]
    replicate("supplier", "SELECT s_suppkey + {k}*" + str(n) +
              " AS s_suppkey, * EXCLUDE (s_suppkey) FROM {src}")
    n = counts["part"]
    replicate("part", "SELECT p_partkey + {k}*" + str(n) +
              " AS p_partkey, * EXCLUDE (p_partkey) FROM {src}")
    no = counts["orders"]
    nc = counts["customer"]
    replicate("orders", "SELECT o_orderkey + {k}*" + str(no * 4) +
              " AS o_orderkey, o_custkey + {k}*" + str(nc) +
              " AS o_custkey, * EXCLUDE (o_orderkey, o_custkey) FROM {src}")
    np_ = counts["part"]
    ns = counts["supplier"]
    replicate("lineitem", "SELECT l_orderkey + {k}*" + str(no * 4) +
              " AS l_orderkey, l_partkey + {k}*" + str(np_) +
              " AS l_partkey, l_suppkey + {k}*" + str(ns) +
              " AS l_suppkey, * EXCLUDE (l_orderkey, l_partkey, l_suppkey) "
              "FROM {src}")
    ne = counts["events"]
    replicate("events", "SELECT event_id + {k}*" + str(ne) +
              " AS event_id, user_id + {k}*1000 AS user_id, "
              "ts + INTERVAL ({k}) SECOND AS ts, "
              "* EXCLUDE (event_id, user_id, ts) FROM {src}")
    nd = counts["documents"]
    replicate("documents", "SELECT doc_id + {k}*" + str(nd) +
              " AS doc_id, CASE WHEN {k} = 0 THEN text ELSE "
              "text || ' r{k}x' END AS text, "
              "* EXCLUDE (doc_id, text) FROM {src}")
    nv = counts["embeddings"]
    # rotate embedding arrays by k positions: stays unit-norm, changes
    # LSH codes/cells so blocks keep realistic density
    replicate("embeddings", "SELECT vec_id + {k}*" + str(nv) +
              " AS vec_id, list_concat(embedding[{k}+1:], "
              "embedding[1:{k}]) AS embedding, "
              "* EXCLUDE (vec_id, embedding) FROM {src}")

    for t, c in counts.items():
        got = con.execute(
            f"SELECT count(*) FROM '{dst}/{t}.parquet'"
        ).fetchone()[0]
        print(t, c, "->", got)


if __name__ == "__main__":
    main()
