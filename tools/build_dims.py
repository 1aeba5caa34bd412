"""Extract the reference's static lookup data into parquet dimension tables.

The reference ships three lookup datasets as Python literals:
- city → latitude (/root/reference/home.py:1720-1801) and
  city → longitude (/root/reference/home.py:1806-1887)
- first name → gender, 12,826 pairs (/root/reference/TR_name_gender.py)
- dummy-phone substrings (/root/reference/home.py:1092-1098)

In a Spark engine these are broadcast-joined dimension tables (SURVEY §2.1
S4).  This script parses the *data* (not code) with a line regex and writes
parquet into dataqtor_spark/dims/data/.  Run once; outputs are committed.
"""

from __future__ import annotations

import ast
import os
import re

import pyarrow as pa
import pyarrow.parquet as pq

REF = "/root/reference"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "dataqtor_spark", "dims", "data")


def parse_city_dict(src: str, name: str) -> dict[str, float]:
    out = {}
    for m in re.finditer(rf"{name}\['(.+?)'\]\s*=\s*([0-9.]+)", src):
        out[m.group(1)] = float(m.group(2))
    return out


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    home = open(os.path.join(REF, "home.py"), encoding="utf-8").read()

    lat = parse_city_dict(home, "city_latitude_dict")
    lon = parse_city_dict(home, "city_longitude_dict")
    assert set(lat) == set(lon) and len(lat) == 81, (len(lat), len(lon))
    cities = sorted(lat)
    pq.write_table(
        pa.table({
            "city": cities,
            "latitude": [lat[c] for c in cities],
            "longitude": [lon[c] for c in cities],
        }),
        os.path.join(OUT, "city.parquet"),
    )

    # name→gender: the file is one literal list of (name, gender) tuples
    ng_src = open(os.path.join(REF, "TR_name_gender.py"), encoding="utf-8").read()
    tree = ast.parse(ng_src)
    assign = tree.body[0]
    pairs = ast.literal_eval(assign.value)
    # the reference maps via dict(tuples): later duplicates win — replicate
    dedup: dict[str, str] = {}
    for n, g in pairs:
        dedup[n] = g
    names = sorted(dedup)
    pq.write_table(
        pa.table({"first_name": names, "gender": [dedup[n] for n in names]}),
        os.path.join(OUT, "name_gender.parquet"),
    )
    print(f"wrote {len(cities)} cities, {len(dedup)} names (from {len(pairs)} pairs) to {OUT}")


if __name__ == "__main__":
    main()
