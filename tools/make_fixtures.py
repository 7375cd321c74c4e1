"""Export the reference's golden dataset to a parquet test fixture.

The reference ships its de-facto golden output — 97 scraped articles — in
``/root/reference/data/articles.db`` (SQLite, all-TEXT schema). We read it
with stdlib sqlite3, type the timestamp columns properly, and write
``tests/fixtures/articles.parquet`` for golden-output tests (SURVEY.md §5.2.1).

Run once: python tools/make_fixtures.py
"""

from __future__ import annotations

import os
import sqlite3
from datetime import datetime

import pyarrow as pa
import pyarrow.parquet as pq

REF_DB = "/root/reference/data/articles.db"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "tests", "fixtures", "articles.parquet")


def parse_ts(s: str | None, fmt: str) -> datetime | None:
    if s is None:
        return None
    return datetime.strptime(s, fmt)


def main() -> None:
    con = sqlite3.connect(REF_DB)
    rows = con.execute(
        "SELECT Article_id, News_link, News_title, Author_name, "
        "News_published_time, Source_name, Processed_at FROM articles"
    ).fetchall()
    cols = list(zip(*rows))
    table = pa.table(
        {
            "Article_id": pa.array(cols[0], pa.string()),
            "News_link": pa.array(cols[1], pa.string()),
            "News_title": pa.array(cols[2], pa.string()),
            "Author_name": pa.array(cols[3], pa.string()),
            "News_published_time": pa.array(
                [parse_ts(v, "%Y-%m-%dT%H:%M:%S") for v in cols[4]],
                pa.timestamp("us"),
            ),
            "Source_name": pa.array(cols[5], pa.string()),
            "Processed_at": pa.array(
                [parse_ts(v, "%Y-%m-%d %H:%M:%S") for v in cols[6]],
                pa.timestamp("us"),
            ),
        }
    )
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {table.num_rows} rows -> {OUT}")


if __name__ == "__main__":
    main()
