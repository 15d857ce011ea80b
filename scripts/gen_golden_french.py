"""Generate the checked-in golden token table for the French analyzer
(VERDICT r2 next-round #9): hand-spot-checkable regression oracle for the
`french_analyzer_tokens` contract query, produced from the pure-Python
canonical implementation (the same function the Spark pandas UDF wraps) over
the sf0.001 documents fixture. Byte-stable: sorted rows, fixed row-group
size, no timestamps.

Usage: python scripts/gen_golden_french.py [out.parquet]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from merge_machine_spark.functions.french import french_estab_tokens  # noqa: E402

SRC = "/root/testdata/sf0.001/documents.parquet"
DEFAULT_OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tests", "golden", "french_tokens_sf0001.parquet",
)


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else DEFAULT_OUT
    t = pq.read_table(SRC, columns=["doc_id", "text"])
    doc_ids, positions, tokens = [], [], []
    for doc_id, text in sorted(zip(t["doc_id"].to_pylist(), t["text"].to_pylist())):
        for pos, tok in enumerate(french_estab_tokens(text)):
            doc_ids.append(doc_id)
            positions.append(pos)
            tokens.append(tok)
    golden = pa.table(
        {"doc_id": pa.array(doc_ids, pa.int64()),
         "pos": pa.array(positions, pa.int32()),
         "token": pa.array(tokens, pa.string())}
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    pq.write_table(golden, out, compression="snappy", row_group_size=65536)
    print(f"wrote {golden.num_rows} rows -> {out}")


if __name__ == "__main__":
    main()
