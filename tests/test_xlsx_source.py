"""Distributed xlsx source: stdlib zip/XML parsing inside mapInPandas.

The fixtures are hand-written ECMA-376 spreadsheetML (sharedStrings,
inline strings, formula caches, omitted cell refs), NOT produced by the
reader's own code path — so these tests exercise the real wire format,
including the storage quirks pandas/openpyxl normally hide.
"""

import zipfile

import pytest

from dataqtor_spark.sources.xlsx import (_parse_xlsx_bytes,
                                         read_excel_distributed)

_SHEET_NS = 'xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"'


def _xlsx(sheet_xml: str, shared: list[str] | None = None,
          extra_sheets: list[str] | None = None) -> bytes:
    import io

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        if shared is not None:
            items = "".join(f"<si><t>{s}</t></si>" for s in shared)
            z.writestr("xl/sharedStrings.xml",
                       f'<sst {_SHEET_NS} count="{len(shared)}">{items}</sst>')
        z.writestr("xl/worksheets/sheet1.xml",
                   f'<worksheet {_SHEET_NS}><sheetData>{sheet_xml}'
                   '</sheetData></worksheet>')
        for i, xml in enumerate(extra_sheets or [], start=2):
            z.writestr(f"xl/worksheets/sheet{i}.xml",
                       f'<worksheet {_SHEET_NS}><sheetData>{xml}'
                       '</sheetData></worksheet>')
    return buf.getvalue()


def test_parse_shared_inline_numbers_and_omitted_refs():
    data = _xlsx(
        '<row r="1">'
        '<c r="A1" t="s"><v>0</v></c>'
        '<c r="B1" t="inlineStr"><is><t>inline text</t></is></c>'
        '<c r="C1"><v>42.5</v></c>'
        '</row>'
        # second row omits every r attribute: cells land sequentially
        '<row><c t="s"><v>1</v></c><c><v>7</v></c><c t="str"><v>fx</v></c>'
        '</row>'
        # third row skips column B via an explicit ref: A then C
        '<row r="3"><c r="A3"><v>1</v></c><c r="C3"><v>3</v></c></row>',
        shared=["hello", "world"])
    rows = _parse_xlsx_bytes(data)
    assert rows[0] == ["hello", "inline text", "42.5"]
    assert rows[1] == ["world", "7", "fx"]
    assert rows[2] == ["1", None, "3"]


def test_parse_selects_sheet_by_index():
    data = _xlsx('<row><c><v>1</v></c></row>',
                 extra_sheets=['<row><c><v>2</v></c></row>'])
    assert _parse_xlsx_bytes(data, 0) == [["1"]]
    assert _parse_xlsx_bytes(data, 1) == [["2"]]
    with pytest.raises(IndexError):
        _parse_xlsx_bytes(data, 2)


def _xlsx_with_workbook(order: list[int]) -> bytes:
    """Three one-cell sheets (values '1','2','3' in part files sheet1-3)
    plus a workbook.xml whose display order is ``order`` (1-based part
    numbers) — models a workbook reordered after creation."""
    import io

    rel_ns = "http://schemas.openxmlformats.org/package/2006/relationships"
    rid_ns = ("http://schemas.openxmlformats.org/officeDocument/2006/"
              "relationships")
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for i in (1, 2, 3):
            z.writestr(f"xl/worksheets/sheet{i}.xml",
                       f'<worksheet {_SHEET_NS}><sheetData>'
                       f'<row><c><v>{i}</v></c></row>'
                       '</sheetData></worksheet>')
        sheets = "".join(
            f'<sheet name="S{p}" sheetId="{k + 1}" r:id="rId{p}"/>'
            for k, p in enumerate(order))
        z.writestr("xl/workbook.xml",
                   f'<workbook {_SHEET_NS} xmlns:r="{rid_ns}">'
                   f'<sheets>{sheets}</sheets></workbook>')
        rels = "".join(
            f'<Relationship Id="rId{i}" Type="t" '
            f'Target="worksheets/sheet{i}.xml"/>' for i in (1, 2, 3))
        z.writestr("xl/_rels/workbook.xml.rels",
                   f'<Relationships xmlns="{rel_ns}">{rels}</Relationships>')
    return buf.getvalue()


def test_sheet_index_follows_workbook_order_not_filenames():
    # workbook displays sheet3 first: sheet_index=0 must yield its rows,
    # exactly what pandas/openpyxl resolve for the same file
    data = _xlsx_with_workbook([3, 1, 2])
    assert _parse_xlsx_bytes(data, 0) == [["3"]]
    assert _parse_xlsx_bytes(data, 1) == [["1"]]
    assert _parse_xlsx_bytes(data, 2) == [["2"]]


def test_sheet_order_falls_back_to_filenames_without_workbook_xml():
    data = _xlsx('<row><c><v>1</v></c></row>',
                 extra_sheets=['<row><c><v>2</v></c></row>'])
    assert _parse_xlsx_bytes(data, 0) == [["1"]]
    assert _parse_xlsx_bytes(data, 1) == [["2"]]


def _write_book(tmp_path, name: str, header: list[str],
                rows: list[list]) -> None:
    def cell(v):
        return ('<c/>' if v is None
                else f'<c t="inlineStr"><is><t>{v}</t></is></c>'
                if isinstance(v, str) else f'<c><v>{v}</v></c>')

    xml = ('<row>' + "".join(
        f'<c t="inlineStr"><is><t>{h}</t></is></c>' for h in header)
        + '</row>')
    for r in rows:
        xml += '<row>' + "".join(cell(v) for v in r) + '</row>'
    (tmp_path / name).write_bytes(_xlsx(xml))


def test_distributed_read_typed_and_header_mapped(spark, tmp_path):
    # two workbooks with DIFFERENT column orders; one malformed numeric
    # cell (try_cast -> NULL) and one file missing a column entirely
    _write_book(tmp_path, "a.xlsx", ["name", "qty", "price"],
                [["ann", 3, 1.5], ["bob", "oops", 2.25]])
    _write_book(tmp_path, "b.xlsx", ["price", "name"],
                [[9.75, "cyd"]])
    df = read_excel_distributed(
        spark, str(tmp_path), "name string, qty int, price double")
    assert [f.dataType.simpleString() for f in df.schema.fields] == \
        ["string", "int", "double"]
    got = {r["name"]: (r["qty"], r["price"]) for r in df.collect()}
    assert got == {"ann": (3, 1.5), "bob": (None, 2.25),
                   "cyd": (None, 9.75)}


def test_distributed_read_positional_without_header(spark, tmp_path):
    _write_book(tmp_path, "c.xlsx", ["x", "y"], [])  # header row only
    # header=False: the header row itself is data, mapped positionally
    df = read_excel_distributed(spark, str(tmp_path / "c.xlsx"),
                                "a string, b string", header=False)
    assert df.collect()[0].asDict() == {"a": "x", "b": "y"}


def test_date_serial_cols_convert_during_ingest(spark, tmp_path):
    import datetime as dt

    # Excel serials: 45292 = 2024-01-01; 45292.5 = same day 12:00:00
    # (days since 1899-12-30, time as the day fraction)
    _write_book(tmp_path, "e.xlsx", ["d", "ts", "plain"],
                [[45292, 45292.5, 45292], ["bad", "bad", 7]])
    df = read_excel_distributed(
        spark, str(tmp_path / "e.xlsx"),
        "d date, ts timestamp, plain int",
        date_serial_cols=["d", "ts"])
    rows = df.orderBy("plain").collect()
    assert rows[1]["d"] == dt.date(2024, 1, 1)
    assert rows[1]["ts"] == dt.datetime(2024, 1, 1, 12, 0, 0)
    assert rows[1]["plain"] == 45292
    # malformed serials keep the PERMISSIVE contract
    assert rows[0]["d"] is None and rows[0]["ts"] is None

    with pytest.raises(ValueError):
        read_excel_distributed(spark, str(tmp_path / "e.xlsx"),
                               "d date", date_serial_cols=["nope"])


def test_ingest_routes_schema_to_distributed_path(spark, tmp_path):
    from dataqtor_spark.session import ingest

    _write_book(tmp_path, "d.xlsx", ["k", "v"], [["one", 1], ["two", 2]])
    df = ingest(spark, str(tmp_path / "d.xlsx"), schema="k string, v long")
    assert "__row_id" in df.columns
    got = {r["k"]: r["v"] for r in df.collect()}
    assert got == {"one": 1, "two": 2}
