"""Minimal pure-stdlib ``.xlsx`` reader (zip + SpreadsheetML XML).

Fallback for :func:`readers.read_excel_measurements` when openpyxl is
not installed: vendor "computed" workbooks (FIXTURES.md F2) are
kilobyte-scale driver-side inputs, so a tiny stdlib parser is enough to
unblock the whole `-e` ingestion path (the reference parses the same
workbooks with ``pd.read_excel``, ``raw_data_reformat.py:151-181``).

Produces the same ``{sheet name: all-string pandas frame}`` shape as
``pd.read_excel(path, sheet_name=None, dtype=str)``: first row is the
header, every value a string, missing cells NaN.

Supported cell content: shared strings (``t="s"``), inline strings
(``t="inlineStr"`` / ``t="str"``), numbers (kept as their literal
stored string — identical to what ``dtype=str`` yields), booleans
(mapped to ``"True"``/``"False"``). LIMITATION (documented, not
silent): date cells stored as Excel serial NUMBERS come back as the
raw serial string; workbooks that store timestamps as text — the F2
fixture shape — round-trip exactly.
"""

from __future__ import annotations

import zipfile
from xml.etree import ElementTree

_NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_RNS = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
_PKG_RNS = "{http://schemas.openxmlformats.org/package/2006/relationships}"


def _col_index(cell_ref: str) -> int:
    """``"B7" -> 1`` (0-based column index from an A1-style reference)."""
    idx = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        data = zf.read("xl/sharedStrings.xml")
    except KeyError:
        return []
    root = ElementTree.fromstring(data)
    out = []
    for si in root.findall(f"{_NS}si"):
        # concatenate every <t> under the item (plain + rich-text runs)
        out.append("".join(t.text or "" for t in si.iter(f"{_NS}t")))
    return out


def _sheet_targets(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """Workbook sheet order: [(sheet name, member path in the zip)]."""
    wb = ElementTree.fromstring(zf.read("xl/workbook.xml"))
    rels = ElementTree.fromstring(zf.read("xl/_rels/workbook.xml.rels"))
    target_by_id = {
        rel.get("Id"): rel.get("Target")
        for rel in rels.iter(f"{_PKG_RNS}Relationship")
    }
    sheets = []
    for sh in wb.iter(f"{_NS}sheet"):
        target = target_by_id[sh.get(f"{_RNS}id")]
        if not target.startswith("/"):
            target = "xl/" + target
        else:
            target = target.lstrip("/")
        sheets.append((sh.get("name"), target))
    return sheets


def _cell_value(cell, shared: list[str]) -> str | None:
    t = cell.get("t", "n")
    if t == "inlineStr":
        is_el = cell.find(f"{_NS}is")
        if is_el is None:
            return None
        return "".join(el.text or "" for el in is_el.iter(f"{_NS}t"))
    v = cell.find(f"{_NS}v")
    if v is None or v.text is None:
        return None
    if t == "s":
        return shared[int(v.text)]
    if t == "b":
        return "True" if v.text.strip() == "1" else "False"
    return v.text


def _sheet_rows(zf: zipfile.ZipFile, member: str, shared: list[str]) -> list[list]:
    root = ElementTree.fromstring(zf.read(member))
    rows: list[dict[int, str]] = []
    for row in root.iter(f"{_NS}row"):
        cells: dict[int, str] = {}
        last = -1
        for c in row.iter(f"{_NS}c"):
            ref = c.get("r")
            ci = _col_index(ref) if ref else last + 1
            last = ci
            val = _cell_value(c, shared)
            if val is not None:
                cells[ci] = val
        rows.append(cells)
    width = max((max(r) + 1 for r in rows if r), default=0)
    return [[r.get(i) for i in range(width)] for r in rows]


def read_xlsx_sheets(path: str) -> dict:
    """``{sheet name: all-string pandas DataFrame}`` — the
    ``pd.read_excel(path, sheet_name=None, dtype=str)`` contract."""
    import numpy as np
    import pandas as pd

    out = {}
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        for name, member in _sheet_targets(zf):
            rows = _sheet_rows(zf, member, shared)
            if not rows:
                out[name] = pd.DataFrame()
                continue
            header = [
                h if h is not None else f"Unnamed: {i}"
                for i, h in enumerate(rows[0])
            ]
            body = rows[1:]
            frame = pd.DataFrame(body, columns=header, dtype=object)
            out[name] = frame.where(frame.notna(), np.nan)
    return out


_SHEET_XML_HEADER = (
    '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
)


def write_xlsx(path: str, sheets: dict) -> None:
    """Tiny inverse used by tests/fixtures: write ``{name: list of
    rows (lists of str/float/None)}`` as a valid minimal workbook.
    Strings are emitted as inline strings, numbers as numeric cells."""

    def cell_xml(ref: str, v) -> str:
        if v is None:
            return ""
        if isinstance(v, (int, float)):
            return f'<c r="{ref}"><v>{v}</v></c>'
        esc = (
            str(v)
            .replace("&", "&amp;")
            .replace("<", "&lt;")
            .replace(">", "&gt;")
        )
        return f'<c r="{ref}" t="inlineStr"><is><t>{esc}</t></is></c>'

    def col_ref(i: int) -> str:
        out = ""
        i += 1
        while i:
            i, rem = divmod(i - 1, 26)
            out = chr(ord("A") + rem) + out
        return out

    names = list(sheets)
    with zipfile.ZipFile(path, "w") as zf:
        zf.writestr(
            "[Content_Types].xml",
            _SHEET_XML_HEADER
            + '<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">'
            + '<Default Extension="xml" ContentType="application/xml"/>'
            + "".join(
                f'<Override PartName="/xl/worksheets/sheet{i + 1}.xml" '
                'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>'
                for i in range(len(names))
            )
            + '<Override PartName="/xl/workbook.xml" '
            'ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
            + "</Types>",
        )
        zf.writestr(
            "_rels/.rels",
            _SHEET_XML_HEADER
            + '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            '<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>'
            "</Relationships>",
        )
        zf.writestr(
            "xl/workbook.xml",
            _SHEET_XML_HEADER
            + '<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" '
            'xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>'
            + "".join(
                f'<sheet name="{n}" sheetId="{i + 1}" r:id="rId{i + 1}"/>'
                for i, n in enumerate(names)
            )
            + "</sheets></workbook>",
        )
        zf.writestr(
            "xl/_rels/workbook.xml.rels",
            _SHEET_XML_HEADER
            + '<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">'
            + "".join(
                f'<Relationship Id="rId{i + 1}" '
                'Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" '
                f'Target="worksheets/sheet{i + 1}.xml"/>'
                for i in range(len(names))
            )
            + "</Relationships>",
        )
        for i, name in enumerate(names):
            rows_xml = []
            for ri, row in enumerate(sheets[name]):
                cells = "".join(
                    cell_xml(f"{col_ref(ci)}{ri + 1}", v)
                    for ci, v in enumerate(row)
                )
                rows_xml.append(f'<row r="{ri + 1}">{cells}</row>')
            zf.writestr(
                f"xl/worksheets/sheet{i + 1}.xml",
                _SHEET_XML_HEADER
                + '<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>'
                + "".join(rows_xml)
                + "</sheetData></worksheet>",
            )
