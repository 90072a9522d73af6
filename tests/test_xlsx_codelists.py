"""Excel codelist ingestion (sources/xlsx.py + load_codelists_xlsx).

Closes the reference-source gap: the reference reads its codelists
straight from ``.xlsx`` workbooks (2_data_importing_cleaning.R:204-269,
4_hypertension_phenotype_main.R:50-54).  The stdlib reader must produce
codelists identical to the CSV path on the same data, and must handle
the SpreadsheetML features real exports use (shared strings, rich-text
runs, sparse cells, floats-that-are-ints).
"""

from __future__ import annotations

import zipfile

import pytest

from hypertension_dashboard_pipeline_spark.sources.codelists import (
    load_codelists_csv,
    load_codelists_xlsx,
)
from hypertension_dashboard_pipeline_spark.sources.xlsx import read_xlsx_rows, write_xlsx


def test_roundtrip_rows(tmp_path):
    rows = [
        ["concept_id", "concept_name"],
        [4152194, "SBP sitting"],
        [3004249, "SBP supine"],
        [8876, "mmHg & <unit>"],
    ]
    p = str(tmp_path / "wb.xlsx")
    write_xlsx(p, rows)
    assert read_xlsx_rows(p) == rows


def test_xlsx_matches_csv_loader(spark, tmp_path):
    codes = {"preg_condition": [101, 202, 303], "esrd_procedure": [77]}
    csv_paths, xlsx_paths = {}, {}
    for name, ids in codes.items():
        csv = tmp_path / f"{name}.csv"
        csv.write_text("concept_id\n" + "\n".join(str(i) for i in ids) + "\n")
        csv_paths[name] = str(csv)
        xlsx = str(tmp_path / f"{name}.xlsx")
        write_xlsx(xlsx, [["concept_id"]] + [[i] for i in ids])
        xlsx_paths[name] = xlsx
    assert load_codelists_xlsx(xlsx_paths) == load_codelists_csv(spark, csv_paths)


def test_shared_strings_and_sparse_cells(tmp_path):
    """Hand-built workbook exercising the paths write_xlsx doesn't emit:
    shared strings (plain + rich-text runs), skipped cells via r refs,
    integer-valued floats (Excel stores all numbers as doubles)."""
    ns = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
    rns = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
    pns = "http://schemas.openxmlformats.org/package/2006/relationships"
    p = str(tmp_path / "shared.xlsx")
    with zipfile.ZipFile(p, "w") as zf:
        zf.writestr(
            "_rels/.rels",
            f'<Relationships xmlns="{pns}">'
            f'<Relationship Id="rId1" Type="{rns}/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>",
        )
        zf.writestr(
            "xl/workbook.xml",
            f'<workbook xmlns="{ns}" xmlns:r="{rns}"><sheets>'
            '<sheet name="codes" sheetId="1" r:id="rId1"/>'
            "</sheets></workbook>",
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            f'<Relationships xmlns="{pns}">'
            f'<Relationship Id="rId1" Type="{rns}/worksheet" Target="worksheets/s1.xml"/>'
            "</Relationships>",
        )
        zf.writestr(
            "xl/sharedStrings.xml",
            f'<sst xmlns="{ns}" count="2" uniqueCount="2">'
            "<si><t>concept_id</t></si>"
            "<si><r><t>rich </t></r><r><t>text</t></r></si>"
            "</sst>",
        )
        zf.writestr(
            "xl/worksheets/s1.xml",
            f'<worksheet xmlns="{ns}"><sheetData>'
            '<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="s"><v>1</v></c></row>'
            '<row r="2"><c r="A2"><v>4152194.0</v></c><c r="C2" t="b"><v>1</v></c></row>'
            "</sheetData></worksheet>",
        )
    rows = read_xlsx_rows(p)
    assert rows == [
        ["concept_id", None, "rich text"],
        [4152194, None, True],
    ]
    assert isinstance(rows[1][0], int)  # 4152194.0 -> exact int concept id
    assert read_xlsx_rows(p, sheet="codes") == rows
    with pytest.raises(KeyError):
        read_xlsx_rows(p, sheet="nope")


def test_blank_rows_and_cells_skipped_by_loader(tmp_path):
    p = str(tmp_path / "gaps.xlsx")
    write_xlsx(p, [["concept_id"], [11], [None], [22]])
    assert load_codelists_xlsx({"x": p}) == {"x": [11, 22]}
